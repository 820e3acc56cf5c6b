"""Fused tag+sig: duplicate signatures from the tag stage's decode.

The reference recomputes pHash/dHash in a separate fan-out decode pass when
the dup tab opens (``src/core/fastsig.py:65-99``); here files being tagged
that lack signature rows get them from the SAME decode — the loader emits
the grayscale hash tiles, the tag stage chains the hash kernels onto the
batch dispatch, and the words ride the WriteItems into the writer's flush.
These tests pin:

* fused hashes are bit-identical to the standalone compute_signatures lane
  (same kernels, same PIL front end);
* after a fused index run `missing_signature_ids` is empty — `ket dup`
  needs no second decode pass;
* failure downgrade: a broken hash dispatch leaves tags intact and the
  standalone lane covers the signatures;
* `inline_signatures=False` disables the lane;
* the sync (non-pipelined tagger) path also fuses;
* a content-changed file refreshes its signature row.
"""

from __future__ import annotations

import time

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import missing_signature_ids
from kobato_eyes_tpu.models.tagger import DummyTagger, WD14Tagger
from kobato_eyes_tpu.sig.signatures import compute_signatures

pytestmark = pytest.mark.integration


def _tagger():
    return WD14Tagger(arch="vit", preset="tiny", image_size=64, fast_math=False)


@pytest.fixture
def env(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "c.sqlite"
    settings = Settings(
        pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2),
    )
    return db, settings, root, paths


def _stored_sigs(db) -> dict[str, tuple[int, int]]:
    conn = bootstrap(db)
    try:
        return {
            r["path"]: (r["phash_u64"], r["dhash_u64"])
            for r in conn.execute(
                "SELECT f.path, s.phash_u64, s.dhash_u64 FROM files f "
                "JOIN signatures s ON s.file_id = f.id"
            )
        }
    finally:
        conn.close()


def test_fused_index_signs_everything_and_matches_standalone(env):
    db, settings, root, paths = env
    stats = run_index_once(db, settings, _tagger())
    assert stats.tagged == len(paths)
    assert stats.extra["signatures_fused"] == len(paths)
    conn = bootstrap(db)
    try:
        assert missing_signature_ids(conn) == []
        id_paths = [(int(r["id"]), r["path"]) for r in conn.execute("SELECT id, path FROM files")]
    finally:
        conn.close()
    # bit-parity with the standalone lane on the same files
    batch = compute_signatures(id_paths, io_workers=2)
    want = dict(zip(batch.file_ids, zip(batch.phash, batch.dhash)))
    stored = _stored_sigs(db)
    by_id = {fid: stored[p] for fid, p in id_paths}
    assert by_id == want

    # second run: nothing to sign
    stats2 = run_index_once(db, settings, _tagger())
    assert stats2.extra["signatures_fused"] == 0


def test_sync_path_fuses_signatures(env):
    """DummyTagger has no dispatch/complete split -> the sync lane."""
    db, settings, root, paths = env
    stats = run_index_once(db, settings, DummyTagger())
    assert stats.tagged == len(paths)
    assert stats.extra["signatures_fused"] == len(paths)
    conn = bootstrap(db)
    try:
        assert missing_signature_ids(conn) == []
    finally:
        conn.close()


def test_inline_signatures_off(env):
    db, settings, root, paths = env
    settings2 = settings.model_copy(deep=True)
    settings2.pipeline.inline_signatures = False
    stats = run_index_once(db, settings2, _tagger())
    assert stats.tagged == len(paths)
    assert stats.extra["signatures_fused"] == 0
    conn = bootstrap(db)
    try:
        assert len(missing_signature_ids(conn)) == len(paths)
    finally:
        conn.close()


def test_sig_dispatch_failure_downgrades(env, monkeypatch):
    """A broken fused hash dispatch must not fail tagging; the standalone
    lane covers the signatures afterwards."""
    import kobato_eyes_tpu.sig.signatures as sigmod

    db, settings, root, paths = env

    def boom(g32, g98):
        raise RuntimeError("hash kernel down")

    monkeypatch.setattr(sigmod, "dispatch_hash_batch", boom, raising=True)
    stats = run_index_once(db, settings, _tagger())
    assert stats.tagged == len(paths)
    assert stats.extra["signatures_fused"] == 0
    conn = bootstrap(db)
    try:
        missing = missing_signature_ids(conn)
        assert len(missing) == len(paths)
        # the standalone lane (what `ket dup` runs) covers them
        batch = compute_signatures(missing, io_workers=2)
        assert len(batch.file_ids) == len(paths)
    finally:
        conn.close()


def test_content_change_refreshes_signature(env, rng):
    db, settings, root, paths = env
    run_index_once(db, settings, _tagger())
    before = _stored_sigs(db)
    # rewrite one file with different content (keep size plausible)
    target = paths[0]
    arr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    Image.fromarray(arr).save(target)
    time.sleep(0.01)
    stats = run_index_once(db, settings, _tagger())
    assert stats.extra["signatures_fused"] == 1
    after = _stored_sigs(db)
    assert after[str(target)] != before[str(target)]
    unchanged = [p for p in before if p != str(target)]
    for p in unchanged:
        assert after[p] == before[p]


def test_writer_persists_signature_items(tmp_path):
    from kobato_eyes_tpu.core.pipeline.contracts import WriteItem
    from kobato_eyes_tpu.db.repository import upsert_file
    from kobato_eyes_tpu.services.writer import CatalogWriter

    reset_bootstrap_cache()
    db = tmp_path / "w.sqlite"
    conn = bootstrap(db)
    try:
        fid = upsert_file(conn, path="/x/a.png", size=1, mtime=0.0)
        conn.commit()
    finally:
        conn.close()
    w = CatalogWriter(db)
    w.start()
    try:
        w.put(WriteItem(
            file_id=fid, tags=[("t", 0.5, 0)], width=1, height=1,
            tagger_sig="s", tagged_at=time.time(), phash=-123, dhash=456,
        ))
    finally:
        w.stop(flush=True)
    assert w.signatures_written == 1
    conn = bootstrap(db)
    try:
        row = conn.execute(
            "SELECT phash_u64, dhash_u64 FROM signatures WHERE file_id=?", (fid,)
        ).fetchone()
    finally:
        conn.close()
    assert row is not None and (row["phash_u64"], row["dhash_u64"]) == (-123, 456)
