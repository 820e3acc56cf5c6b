"""HTTP serving mode: resident-epoch queries behind the JSON API."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
from kobato_eyes_tpu.services.server import make_server


@pytest.fixture
def server(tmp_path):
    reset_bootstrap_cache()
    db = tmp_path / "s.sqlite"
    conn = bootstrap(db)
    fids = []
    for i in range(40):
        fid = upsert_file(conn, path=f"/s/{i:03d}.png", mtime=1e9 + i)
        tags = [("girl", 0.9, 0)] if i % 2 == 0 else [("cat", 0.6, 0)]
        write_tagging_batch(conn, [TaggingItem(fid, tags)])
        fids.append(fid)
    conn.close()
    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address
    yield f"http://{host}:{port}", db, fids
    httpd.shutdown()
    httpd.server_close()


def _get(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def _post(url: str, payload: dict | None = None) -> dict:
    data = json.dumps(payload or {}).encode()
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_health_and_search(server):
    base, _, _ = server
    health = _get(f"{base}/healthz")
    assert health["ok"] and health["files"] == 40
    out = _get(f"{base}/search?q=girl&order=id&limit=100")
    assert len(out["results"]) == 20
    assert out["elapsed_ms"] >= 0
    out = _get(f"{base}/search?q=girl%20OR%20cat&order=id&limit=100")
    assert len(out["results"]) == 40


def test_complete_and_stats(server):
    base, _, _ = server
    comp = _get(f"{base}/complete?prefix=gi")
    assert comp["completions"][0][0] == "girl"
    stats = _get(f"{base}/stats?like=girl")
    assert stats["stats"][0]["name"] == "girl"
    assert stats["stats"][0]["file_count"] == 20


def test_bad_query_is_400_not_fatal(server):
    base, _, _ = server
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(f"{base}/search?q=girl%20OR")  # dangling operator
    assert err.value.code == 400
    # server still alive
    assert _get(f"{base}/healthz")["ok"]


def test_delta_and_reload_swap_epochs(server):
    base, db, fids = server
    v0 = _get(f"{base}/healthz")["epoch"]
    conn = bootstrap(db)
    write_tagging_batch(conn, [TaggingItem(fids[0], [("dog", 0.7, 0)])])
    conn.close()
    out = _post(f"{base}/delta", {"changed_file_ids": [fids[0]]})
    assert out["epoch"] == v0 + 1
    hits = _get(f"{base}/search?q=dog&order=id")
    assert [r["file_id"] for r in hits["results"]] == [fids[0]]
    out = _post(f"{base}/reload")
    assert out["epoch"] == v0 + 2
    assert len(_get(f"{base}/search?q=dog&order=id")["results"]) == 1


def test_post_search_batch(server):
    """POST /search: the amortized multi-query lane returns per-query result
    lists identical to GET /search (VERDICT r4 #4)."""
    base, _, _ = server
    queries = ["girl", "cat", "girl OR cat", "nosuchtag"]
    out = _post(f"{base}/search", {"queries": queries, "order": "id", "limit": 100})
    assert [b["query"] for b in out["batches"]] == queries
    assert out["elapsed_ms"] >= 0
    for b in out["batches"]:
        import urllib.parse

        solo = _get(
            f"{base}/search?q={urllib.parse.quote(b['query'])}&order=id&limit=100"
        )
        assert [r["file_id"] for r in b["results"]] == [
            r["file_id"] for r in solo["results"]
        ]
    # malformed payloads are 400s, not crashes
    import urllib.error

    for payload in ({}, {"queries": []}, {"queries": "girl"}, {"queries": [1]}):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{base}/search", payload)
        assert err.value.code == 400
    assert _get(f"{base}/healthz")["ok"]


def test_unknown_endpoint_404(server):
    base, _, _ = server
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(f"{base}/nope")
    assert err.value.code == 404


@pytest.mark.stress
def test_concurrent_searches_during_epoch_swaps(server):
    """Readers in flight keep their epoch; swaps never produce torn reads.

    Hammers /search from several threads while /reload and /delta swap
    epochs underneath — every response must be internally consistent (a
    valid epoch version and a result set that matches either the old or the
    new state, never a mix) and no request may error."""
    import threading

    base, db, fids = server
    stop = threading.Event()
    errors: list[str] = []

    def searcher():
        while not stop.is_set():
            try:
                out = _get(f"{base}/search?q=girl%20OR%20cat%20OR%20dog&order=id&limit=100")
                n = len(out["results"])
                # old state: 40 files tagged girl/cat; after the delta the
                # retagged file answers dog instead — total always 40
                if n != 40:
                    errors.append(f"torn read: {n} results at epoch {out['epoch']}")
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

    threads = [threading.Thread(target=searcher) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        conn = bootstrap(db)
        for i in range(6):
            write_tagging_batch(
                conn, [TaggingItem(fids[i], [("dog", 0.7, 0)])]
            )
            conn.commit()
            if i % 2 == 0:
                _post(f"{base}/delta", {"changed_file_ids": [fids[i]]})
            else:
                _post(f"{base}/reload")
        conn.close()
    finally:
        stop.set()
        for t in threads:
            t.join(30)
    assert not errors, errors[:5]
    final = _get(f"{base}/search?q=dog&order=id&limit=100")
    assert len(final["results"]) == 6


def test_oversized_post_body_rejected_413(server):
    """A huge client-declared Content-Length must be rejected before the
    body is read into memory (advisor round 2)."""
    import urllib.error

    base, _, _ = server
    req = urllib.request.Request(
        f"{base}/delta", data=b"{}", method="POST",
        headers={"Content-Length": str(1 << 31)},
    )
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 413
    # server still alive and serving
    assert _get(f"{base}/healthz")["files"] == 40


def test_dup_endpoint_clusters_and_audit(tmp_path):
    """GET /dup serves the dup-tab workflow: clusters from catalog hashes,
    steady-state token reuse across requests, optional cohesion audit."""
    reset_bootstrap_cache()
    db = tmp_path / "d.sqlite"
    conn = bootstrap(db)
    from kobato_eyes_tpu.db.repository import upsert_signatures

    base = 0x1234_5678_9ABC_DEF0
    rows = []
    for i in range(12):
        fid = upsert_file(conn, path=f"/d/{i:03d}.png", size=1000 + i, mtime=1e9)
        write_tagging_batch(conn, [TaggingItem(fid, [("t", 0.9, 0)])])
        # three planted clusters of 4 near-identical hashes each
        h = base ^ (0xFFFF << (16 * (i // 4))) ^ (1 << (i % 4))
        rows.append((fid, h, h))
    with conn:
        upsert_signatures(conn, rows)
    conn.close()

    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base_url = f"http://{host}:{port}"
        out = _get(f"{base_url}/dup?hamming=8&audit=1")
        assert out["total_clusters"] == 3
        assert all(len(c["members"]) == 4 for c in out["clusters"])
        assert len(out["audit"]) == 3
        assert all(a["diameter"] <= 8 for a in out["audit"])
        # second request: steady-state (token = epoch version) and identical
        again = _get(f"{base_url}/dup?hamming=8")
        assert [c["keeper_id"] for c in again["clusters"]] == [
            c["keeper_id"] for c in out["clusters"]
        ]
        # tighter threshold is a separate scanner/config, not a stale cache
        tight = _get(f"{base_url}/dup?hamming=0")
        assert tight["total_clusters"] == 0
        # sweeping configs must not accumulate scanners (each holds
        # device-resident copies of the catalog hashes): LRU-bounded
        for h in (1, 2, 3, 4, 5):
            _get(f"{base_url}/dup?hamming={h}")
        assert len(core._dup_scanners) <= core._dup_scanners_cap
        # catalog rows -> metas conversion runs once per epoch version
        m1 = core._dup_metas
        assert m1 is not None and m1[0] == out["epoch"]
        _get(f"{base_url}/dup?hamming=8")
        assert core._dup_metas is m1
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_file_and_thumb_endpoints(tmp_path):
    """GET /file hydrates metadata+tags; GET /thumb serves cached WEBP bytes
    (the reference result-view/thumbnail backing, over HTTP)."""
    from PIL import Image

    reset_bootstrap_cache()
    db = tmp_path / "t.sqlite"
    conn = bootstrap(db)
    img_path = tmp_path / "pic.png"
    Image.new("RGB", (40, 30), (10, 200, 30)).save(img_path)
    fid = upsert_file(conn, path=str(img_path), size=img_path.stat().st_size,
                      mtime=img_path.stat().st_mtime, width=40, height=30)
    write_tagging_batch(conn, [TaggingItem(fid, [("green", 0.9, 0), ("wide", 0.5, 4)])])
    ghost = upsert_file(conn, path=str(tmp_path / "gone.png"), size=1, mtime=1e9)
    conn.close()

    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        info = _get(f"{base}/file?id={fid}")
        assert info["path"] == str(img_path) and info["width"] == 40
        assert {t["name"] for t in info["tags"]} == {"green", "wide"}

        with urllib.request.urlopen(f"{base}/thumb?id={fid}&size=32", timeout=30) as r:
            assert r.headers["Content-Type"] == "image/webp"
            body = r.read()
        assert body[:4] == b"RIFF" and b"WEBP" in body[:16]
        # second hit serves the same cached file
        with urllib.request.urlopen(f"{base}/thumb?id={fid}&size=32", timeout=30) as r:
            assert r.read() == body

        # unknown id -> 404; missing image file -> 404; missing param -> 400
        for url, want in ((f"{base}/file?id=999999", 404),
                          (f"{base}/thumb?id={ghost}", 404),
                          (f"{base}/thumb", 400)):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(url, timeout=30)
            assert ei.value.code == want, url
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_trash_endpoint_soft_deletes_and_moves(tmp_path):
    """POST /trash = the dup-tab 'trash checked' action over HTTP: files move
    to the app trash (reversible), rows go absent, epoch refresh drops them."""
    from PIL import Image

    reset_bootstrap_cache()
    root = tmp_path / "approot"
    (root / "db").mkdir(parents=True)
    db = root / "db" / "catalog.sqlite3"
    conn = bootstrap(db)
    img = tmp_path / "victim.png"
    Image.new("RGB", (8, 8)).save(img)
    vid = upsert_file(conn, path=str(img), size=8, mtime=1e9)
    write_tagging_batch(conn, [TaggingItem(vid, [("doomed", 0.9, 0)])])
    keep = upsert_file(conn, path=str(tmp_path / "keep.png"), size=8, mtime=1e9)
    write_tagging_batch(conn, [TaggingItem(keep, [("doomed", 0.8, 0)])])
    conn.close()

    httpd, core = make_server(db, data_root=root)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        out = _post(f"{base}/trash", {"file_ids": [vid, 999999]})
        assert out["trashed"] == [vid] and out["failed"] == [999999]
        assert not img.exists()  # moved, not deleted
        assert any((root / "trash").rglob("*victim*"))
        # old epoch still serves both until a refresh
        assert len(_get(f"{base}/search?q=doomed&order=id")["results"]) == 2
        _post(f"{base}/reload")
        hits = _get(f"{base}/search?q=doomed&order=id")["results"]
        assert [r["file_id"] for r in hits] == [keep]
        # empty / malformed body -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/trash", {"file_ids": []})
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_dup_refine_over_http_drops_hash_collision(tmp_path):
    """GET /dup?refine=1 = the reference's auto-refine after scan: a fake
    phash collision (visually unrelated file) is dropped by the tile-hash +
    pixel verification; the true copy survives."""
    import numpy as np
    from PIL import Image

    reset_bootstrap_cache()
    db = tmp_path / "r.sqlite"
    conn = bootstrap(db)
    from kobato_eyes_tpu.db.repository import upsert_signatures

    rng = np.random.default_rng(3)
    base_img = tmp_path / "orig.png"
    smooth = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    Image.fromarray(smooth).resize((128, 128), Image.BICUBIC).save(base_img)
    copy_img = tmp_path / "copy.png"
    Image.open(base_img).save(copy_img)
    impostor = tmp_path / "impostor.png"  # unrelated pixels, same planted hash
    Image.fromarray(
        rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    ).resize((128, 128), Image.BICUBIC).save(impostor)

    h = 0x0123_4567_89AB_CDEF
    rows = []
    # explicit sizes pin keeper selection to orig (max size wins), so the
    # refine comparison runs real-vs-keeper, not vs the impostor
    for p, size in ((base_img, 5000), (copy_img, 4000), (impostor, 100)):
        fid = upsert_file(conn, path=str(p), size=size, mtime=1e9)
        write_tagging_batch(conn, [TaggingItem(fid, [("t", 0.9, 0)])])
        rows.append((fid, h, h))  # identical phash: all three cluster
    with conn:
        upsert_signatures(conn, rows)
    conn.close()

    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        raw = _get(f"{base}/dup?hamming=4")
        assert raw["total_clusters"] == 1
        assert len(raw["clusters"][0]["members"]) == 3  # collision included
        refined = _get(f"{base}/dup?hamming=4&refine=1")
        assert refined["total_clusters"] == 1  # raw scan total, flag-invariant
        assert refined["refined_clusters"] == 1 and raw["refined_clusters"] is None
        names = {m["path"].rsplit("/", 1)[-1] for m in refined["clusters"][0]["members"]}
        assert names == {"orig.png", "copy.png"}  # impostor verified away
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_trash_batch_survives_unmovable_file(tmp_path):
    """One unmovable file (system-path guard) lands in 'failed'; the rest of
    the batch still moves and gets soft-deleted — no mid-batch abort."""
    from PIL import Image

    reset_bootstrap_cache()
    db = tmp_path / "b.sqlite"
    conn = bootstrap(db)
    good = tmp_path / "good.png"
    Image.new("RGB", (8, 8)).save(good)
    gid = upsert_file(conn, path=str(good), size=8, mtime=1e9)
    write_tagging_batch(conn, [TaggingItem(gid, [("t", 0.9, 0)])])
    sysid = upsert_file(conn, path="/usr/bin/env", size=8, mtime=1e9)  # guarded
    write_tagging_batch(conn, [TaggingItem(sysid, [("t", 0.9, 0)])])
    conn.close()

    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        out = _post(f"{base}/trash", {"file_ids": [sysid, gid]})
        assert out["trashed"] == [gid] and out["failed"] == [sysid]
        assert not good.exists()
        from pathlib import Path as _P

        assert _P("/usr/bin/env").exists()  # guard refused, file untouched
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_similar_endpoint_over_stored_embeddings(tmp_path):
    """GET /similar serves 'more like this' from catalog embeddings: nearest
    neighbors by cosine, query excluded, index rebuilt on epoch change."""
    import numpy as np

    reset_bootstrap_cache()
    db = tmp_path / "sim.sqlite"
    conn = bootstrap(db)
    from kobato_eyes_tpu.core.pipeline.embed_stage import store_embeddings

    base_vec = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    near = np.array([0.95, 0.05, 0.0, 0.0], np.float32)
    far = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    fids = []
    for i, v in enumerate((base_vec, near, far)):
        fid = upsert_file(conn, path=f"/sim/{i}.png", size=10, mtime=1e9)
        write_tagging_batch(conn, [TaggingItem(fid, [("t", 0.9, 0)])])
        fids.append((fid, v))
    with conn:
        store_embeddings(conn, fids)
    conn.close()

    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        out = _get(f"{base}/similar?id={fids[0][0]}&k=2")
        got = [r["file_id"] for r in out["results"]]
        assert got == [fids[1][0], fids[2][0]]  # near first, query excluded
        assert out["results"][0]["score"] > out["results"][1]["score"]
        assert out["results"][0]["path"] == "/sim/1.png"
        # unknown id and missing embeddings -> 404s
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/similar?id=999999")
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_similar_index_rebuilds_on_epoch_swap(tmp_path):
    """/similar's index is epoch-keyed: a /delta that lands a new embedding
    makes the next query see it without a server restart."""
    import numpy as np

    reset_bootstrap_cache()
    db = tmp_path / "simr.sqlite"
    conn = bootstrap(db)
    from kobato_eyes_tpu.core.pipeline.embed_stage import store_embeddings

    a = upsert_file(conn, path="/r/a.png", size=10, mtime=1e9)
    b = upsert_file(conn, path="/r/b.png", size=10, mtime=1e9)
    for fid in (a, b):
        write_tagging_batch(conn, [TaggingItem(fid, [("t", 0.9, 0)])])
    va = np.array([1.0, 0.0], np.float32)
    with conn:
        store_embeddings(conn, [(a, va), (b, np.array([0.0, 1.0], np.float32))])
    conn.close()

    httpd, core = make_server(db)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        first = _get(f"{base}/similar?id={a}&k=5")
        assert [r["file_id"] for r in first["results"]] == [b]

        conn = bootstrap(db)
        c = upsert_file(conn, path="/r/c.png", size=10, mtime=1e9)
        write_tagging_batch(conn, [TaggingItem(c, [("t", 0.9, 0)])])
        with conn:
            store_embeddings(conn, [(c, va)])  # exact twin of a
        conn.close()
        _post(f"{base}/delta", {"changed_file_ids": [c]})

        second = _get(f"{base}/similar?id={a}&k=5")
        assert [r["file_id"] for r in second["results"]] == [c, b]
        assert second["epoch"] == first["epoch"] + 1
    finally:
        httpd.shutdown()
        httpd.server_close()
