"""Catalog CRUD semantics: upsert/COALESCE, tagging writes, soft delete, quiesce."""

from __future__ import annotations

import threading

import pytest

from kobato_eyes_tpu.db.connection import (
    QuiesceError,
    bootstrap,
    connect,
    quiesced,
    reset_bootstrap_cache,
)
from kobato_eyes_tpu.db.repository import (
    TaggingItem,
    autocomplete_tags,
    clear_tagger_sig,
    delete_files,
    fetch_files_by_paths,
    iter_files_for_dup,
    list_untagged_under_path,
    load_tag_thresholds,
    mark_files_absent,
    missing_signature_ids,
    set_tag_threshold,
    tag_stats,
    tags_for_files,
    upsert_file,
    upsert_signatures,
    write_tagging_batch,
)


@pytest.fixture
def conn(tmp_path):
    reset_bootstrap_cache()
    c = bootstrap(tmp_path / "t.sqlite")
    yield c
    c.close()


def test_upsert_file_coalesce(conn):
    fid = upsert_file(conn, path="/a/x.png", size=10, mtime=1.0)
    fid2 = upsert_file(conn, path="/a/x.png", sha256="abc")
    assert fid == fid2
    row = conn.execute("SELECT * FROM files WHERE id=?", (fid,)).fetchone()
    assert row["size"] == 10 and row["sha256"] == "abc"  # old fields kept


def test_write_tagging_batch_replaces(conn):
    fid = upsert_file(conn, path="/a/y.png")
    write_tagging_batch(conn, [TaggingItem(fid, [("a", 0.9, 0), ("b", 0.5, 4)], tagger_sig="s1")])
    write_tagging_batch(conn, [TaggingItem(fid, [("c", 0.7, 0)], tagger_sig="s2")])
    tags = tags_for_files(conn, [fid])[fid]
    assert [t[0] for t in tags] == ["c"]
    row = conn.execute("SELECT tagger_sig FROM files WHERE id=?", (fid,)).fetchone()
    assert row["tagger_sig"] == "s2"


def test_soft_and_hard_delete(conn):
    fid = upsert_file(conn, path="/a/z.png")
    write_tagging_batch(conn, [TaggingItem(fid, [("a", 0.9, 0)])])
    upsert_signatures(conn, [(fid, 123, 456)])
    mark_files_absent(conn, [fid])
    assert conn.execute("SELECT is_present FROM files WHERE id=?", (fid,)).fetchone()[0] == 0
    assert not iter_files_for_dup(conn)  # absent rows excluded
    delete_files(conn, [fid])
    assert conn.execute("SELECT COUNT(*) FROM files").fetchone()[0] == 0
    assert conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()[0] == 0
    assert conn.execute("SELECT COUNT(*) FROM signatures").fetchone()[0] == 0


def test_untagged_and_retag(conn):
    a = upsert_file(conn, path="/r/a.png", tagger_sig="sig")
    b = upsert_file(conn, path="/r/b.png")
    untagged = list_untagged_under_path(conn, "/r")
    assert [r["id"] for r in untagged] == [b]
    clear_tagger_sig(conn, only_sig="sig")
    assert len(list_untagged_under_path(conn, "/r")) == 2
    assert a != b


def test_signatures_and_missing(conn):
    a = upsert_file(conn, path="/s/a.png")
    b = upsert_file(conn, path="/s/b.png")
    upsert_signatures(conn, [(a, -5, 7)])
    conn.commit()
    missing = missing_signature_ids(conn)
    assert [m[0] for m in missing] == [b]
    rows = iter_files_for_dup(conn)
    assert rows[0]["phash_u64"] == -5  # signed-64 storage form


def test_thresholds_roundtrip(conn):
    assert load_tag_thresholds(conn) == {}
    set_tag_threshold(conn, 0, 0.4)
    set_tag_threshold(conn, 0, 0.5)
    assert load_tag_thresholds(conn) == {0: 0.5}


def test_fetch_by_paths_has_tags_flag(conn):
    a = upsert_file(conn, path="/p/a.png")
    upsert_file(conn, path="/p/b.png")
    write_tagging_batch(conn, [TaggingItem(a, [("t", 0.9, 0)])])
    rows = fetch_files_by_paths(conn, ["/p/a.png", "/p/b.png", "/p/missing.png"])
    assert rows["/p/a.png"]["has_tags"] == 1
    assert rows["/p/b.png"]["has_tags"] == 0
    assert "/p/missing.png" not in rows


def test_stats_and_autocomplete(conn):
    a = upsert_file(conn, path="/q/a.png")
    b = upsert_file(conn, path="/q/b.png")
    write_tagging_batch(conn, [
        TaggingItem(a, [("longhair", 0.9, 0), ("smile", 0.2, 0)]),
        TaggingItem(b, [("longhair", 0.6, 0)]),
    ])
    stats = tag_stats(conn, thresholds={0: 0.5})
    by_name = {r["name"]: r for r in stats}
    assert by_name["longhair"]["file_count"] == 2
    assert "smile" not in by_name  # below threshold
    comp = autocomplete_tags(conn, "long")
    assert comp[0][0] == "longhair" and comp[0][2] == 2


def test_quiesce_blocks_new_connections(tmp_path):
    reset_bootstrap_cache()
    db = tmp_path / "q.sqlite"
    bootstrap(db).close()
    with quiesced():
        # owner thread can still connect
        connect(db).close()
        err: list[Exception] = []

        def other():
            try:
                connect(db)
            except Exception as exc:  # noqa: BLE001
                err.append(exc)

        t = threading.Thread(target=other)
        t.start()
        t.join()
        assert err and isinstance(err[0], QuiesceError)
    # gate released
    connect(db).close()


def test_bulk_scan_upsert(conn):
    from kobato_eyes_tpu.db.repository import bulk_scan_upsert

    ids = bulk_scan_upsert(conn, [
        ("/b/a.png", 10, 1.0, "sha_a"),
        ("/b/b.png", 20, 2.0, None),
    ])
    assert set(ids) == {"/b/a.png", "/b/b.png"}
    # update: size/mtime refresh, sha kept when None
    ids2 = bulk_scan_upsert(conn, [("/b/a.png", 11, 1.5, None)])
    assert ids2["/b/a.png"] == ids["/b/a.png"]
    row = conn.execute("SELECT * FROM files WHERE path='/b/a.png'").fetchone()
    assert row["size"] == 11 and row["sha256"] == "sha_a"
    # absent row resurrection
    mark_files_absent(conn, [ids["/b/b.png"]])
    bulk_scan_upsert(conn, [("/b/b.png", 20, 2.0, None)])
    row = conn.execute("SELECT is_present FROM files WHERE path='/b/b.png'").fetchone()
    assert row["is_present"] == 1


def test_thresholds_fallback_normalization(conn):
    """Every backend interprets a missing/partial thresholds table through
    the 0.35/0.25/0.25 fallbacks (reference _resolve_relevance_thresholds),
    never as 0.0 gates."""
    from kobato_eyes_tpu.db.repository import search_files

    fid_low = upsert_file(conn, path="/n/low.png")
    fid_hi = upsert_file(conn, path="/n/hi.png")
    write_tagging_batch(conn, [
        TaggingItem(fid_low, [("1girl", 0.20, 0)]),   # below 0.35 general fallback
        TaggingItem(fid_hi, [("1girl", 0.90, 0)]),
    ])

    # search_files with empty thresholds: sub-fallback score earns no relevance
    rows = search_files(conn, "1=1", [], positive_tags=["1girl"], thresholds={})
    rel = {r.file_id: r.relevance for r in rows}
    assert rel[fid_hi] == pytest.approx(0.90)
    assert rel[fid_low] == 0.0

    # tag_stats with empty thresholds: only the above-fallback row counts
    stats = tag_stats(conn, thresholds={})
    row = next(r for r in stats if r["name"] == "1girl")
    assert row["file_count"] == 1

    # explicit override still wins over the fallback
    rows = search_files(
        conn, "1=1", [], positive_tags=["1girl"], thresholds={0: 0.1}
    )
    rel = {r.file_id: r.relevance for r in rows}
    assert rel[fid_low] == pytest.approx(0.20)


def test_double_quiesce_rejected(tmp_path):
    from kobato_eyes_tpu.db.connection import QuiesceError, begin_quiesce, end_quiesce

    begin_quiesce()
    try:
        with pytest.raises(QuiesceError, match="already"):
            begin_quiesce()
    finally:
        end_quiesce()


def test_connect_zero_wait_raises_under_foreign_quiesce(tmp_path):
    """wait_timeout=0 is the non-blocking probe: it must raise immediately
    when another thread holds the quiesce gate."""
    import threading

    from kobato_eyes_tpu.db.connection import (
        QuiesceError,
        begin_quiesce,
        bootstrap,
        connect,
        end_quiesce,
        reset_bootstrap_cache,
    )

    reset_bootstrap_cache()
    db = tmp_path / "qz.sqlite"
    bootstrap(db).close()

    t = threading.Thread(target=begin_quiesce)
    t.start()
    t.join()
    try:
        with pytest.raises(QuiesceError):
            connect(db, wait_timeout=0.0)
        with pytest.raises(QuiesceError, match="timed out"):
            connect(db, wait_timeout=0.05)
        # the writer path bypasses the gate
        c = connect(db, wait_timeout=0.0, bypass_quiesce=True)
        c.close()
    finally:
        end_quiesce()


def test_search_order_by_whitelist(conn):
    from kobato_eyes_tpu.db.repository import search_files

    with pytest.raises(ValueError, match="order_by"):
        search_files(conn, "1=1", [], order_by="evil; DROP TABLE files")


def test_write_tagging_batch_empty_noop(conn):
    from kobato_eyes_tpu.db.repository import write_tagging_batch

    write_tagging_batch(conn, [])  # no transaction, no error


def test_load_tag_thresholds_skips_bad_rows(conn):
    from kobato_eyes_tpu.db.repository import normalize_thresholds

    merged = normalize_thresholds({"0": "0.5", "bad": "x", 2: None, 3: 0.7})
    assert merged[0] == 0.5 and merged[3] == 0.7
    assert all(isinstance(k, int) for k in merged)
