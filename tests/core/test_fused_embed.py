"""Fused tag+embed dispatch: one decode, one upload, vectors via the writer.

The embed stage's own decode+upload pass was 23% of the cold index wall
(docs/benchmarks.md r5 attribution); when the embedder's derived prep is the
tagger's prepared geometry (wd14 letterbox at an integer multiple of
image_size), the tag stage chains the embedding forward onto the same device
pixels and the vectors ride the write queue. These tests pin:

* derived-prep math: device mean-pool == host pooling of the same letterbox;
* fused vectors are identical to what the derived embedder computes alone;
* prep provenance in the catalog meta table + invalidation on change;
* failure downgrade: a broken fused dispatch leaves tags intact and the
  residual embed stage covers the vectors;
* the writer persists WriteItem.embedding rows transactionally.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from kobato_eyes_tpu.core.config.schema import IndexSettings, PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.core.pipeline.embed_stage import load_embeddings
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import ensure_embed_prep, get_embed_prep
from kobato_eyes_tpu.index.embedder import ImageEmbedder, embedder_from_catalog
from kobato_eyes_tpu.models.tagger import WD14Tagger

pytestmark = pytest.mark.integration

EMB_KW = dict(preset="tiny", image_size=32, patch_size=16, embed_dim=64)


def _tagger():
    # wd14-mode (white letterbox) at 64px = 2x the embedder's 32px input
    return WD14Tagger(arch="vit", preset="tiny", image_size=64, fast_math=False)


@pytest.fixture
def env(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "c.sqlite"
    settings = Settings(
        pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2),
        index=IndexSettings(enabled=True, **EMB_KW),
    )
    return db, settings, root, paths


def test_derived_prep_matches_host_pooling(rng):
    """Device f×f mean pool of the letterboxed uint8 == host pooling fed to a
    plain embedder with the same params (same cfg + seed => same init)."""
    derived = ImageEmbedder(derive_from=64, **EMB_KW)
    plain = ImageEmbedder(**EMB_KW)
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for h, w in [(50, 70), (64, 64)]]
    prepared = derived.prepare_batch_from_rgb(imgs)  # (B, 64, 64, 3) uint8
    assert prepared.shape[1:] == (64, 64, 3)
    out_derived = derived.embed_batch_prepared(prepared)
    b, h, w, c = prepared.shape
    pooled = prepared.astype(np.float32).reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    out_plain = plain.embed_batch_prepared(pooled)
    np.testing.assert_allclose(out_derived, out_plain, atol=1e-5)


def test_fused_index_embeds_everything(env):
    db, settings, root, paths = env
    stats = run_index_once(db, settings, _tagger())
    assert stats.tagged == len(paths)
    assert stats.extra["embedded_fused"] == len(paths)
    assert stats.extra["embedded"] == len(paths)
    conn = bootstrap(db)
    try:
        ids, vecs = load_embeddings(conn)
        prep = get_embed_prep(conn, "clip-vit")
    finally:
        conn.close()
    assert len(ids) == len(paths)
    assert vecs.shape == (len(paths), 64)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-4)
    assert prep == "lb64->mean->32"

    # fused vectors == the derived embedder run standalone on the same files
    from kobato_eyes_tpu.utils.image_io import load_rgb_array

    conn = bootstrap(db)
    try:
        rows = {int(r["id"]): r["path"] for r in conn.execute("SELECT id, path FROM files")}
    finally:
        conn.close()
    derived = ImageEmbedder(derive_from=64, **EMB_KW)
    want = derived.embed_batch([load_rgb_array(rows[int(i)]) for i in ids])
    np.testing.assert_allclose(vecs, want, atol=1e-5)

    # second run: nothing re-embedded, prep unchanged
    stats2 = run_index_once(db, settings, _tagger())
    assert stats2.extra["embedded"] == 0
    assert stats2.extra["embedded_fused"] == 0


def test_prep_change_invalidates_stored_vectors(env):
    db, settings, root, paths = env
    run_index_once(db, settings, _tagger())
    # switch fusion off: prep becomes the plain center crop -> full re-embed
    settings2 = settings.model_copy(deep=True)
    settings2.index.fused = False
    stats = run_index_once(db, settings2, _tagger())
    assert stats.extra["embedded"] == len(paths)
    assert stats.extra["embedded_fused"] == 0
    conn = bootstrap(db)
    try:
        assert get_embed_prep(conn, "clip-vit") == "cc32"
        ids, vecs = load_embeddings(conn)
    finally:
        conn.close()
    assert len(ids) == len(paths)


def test_embedder_from_catalog_reconstructs_prep(env):
    db, settings, root, paths = env
    run_index_once(db, settings, _tagger())
    conn = bootstrap(db)
    try:
        emb = embedder_from_catalog(conn, **EMB_KW)
        assert emb.derive_from == 64
        # incompatible image_size falls back to plain prep with a warning
        emb2 = embedder_from_catalog(conn, preset="tiny", image_size=16,
                                     patch_size=16, embed_dim=64)
        assert emb2.derive_from is None
    finally:
        conn.close()


def test_fused_dispatch_failure_downgrades_to_residual(env, monkeypatch):
    """A broken fused embed dispatch must not fail tagging; the residual
    embed stage covers the vectors afterwards."""
    db, settings, root, paths = env
    n_batches = (len(paths) + 1) // 2  # batch_size=2
    calls = {"n": 0}
    orig = ImageEmbedder.dispatch_batch_prepared

    def flaky(self, batch):
        calls["n"] += 1
        if calls["n"] <= n_batches:  # every fused attempt fails...
            raise RuntimeError("fused dispatch down")
        return orig(self, batch)  # ...the residual stage works

    monkeypatch.setattr(ImageEmbedder, "dispatch_batch_prepared", flaky)
    stats = run_index_once(db, settings, _tagger())
    assert stats.tagged == len(paths)
    assert stats.extra["embedded_fused"] == 0
    assert stats.extra["embedded"] == len(paths)
    conn = bootstrap(db)
    try:
        ids, vecs = load_embeddings(conn)
    finally:
        conn.close()
    assert len(ids) == len(paths)


def test_writer_persists_embedding_items(tmp_path):
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
    vec = np.arange(8, dtype=np.float32)
    w = CatalogWriter(db)
    w.start()
    try:
        w.put(WriteItem(
            file_id=fid, tags=[("t", 0.5, 0)], width=1, height=1,
            tagger_sig="s", tagged_at=time.time(),
            embedding=vec, embed_model="clip-vit",
        ))
    finally:
        w.stop(flush=True)
    assert w.embeddings_written == 1
    conn = bootstrap(db)
    try:
        row = conn.execute(
            "SELECT dim, vector FROM embeddings WHERE file_id=? AND model='clip-vit'",
            (fid,),
        ).fetchone()
    finally:
        conn.close()
    assert row is not None and row["dim"] == 8
    np.testing.assert_array_equal(np.frombuffer(row["vector"], np.float32), vec)


def test_ensure_embed_prep_legacy_rows(tmp_path):
    """A catalog with vectors but no recorded prep: plain prep adopts them,
    a derived prep drops them (they cannot have been derived)."""
    from kobato_eyes_tpu.db.repository import upsert_embeddings, upsert_file

    reset_bootstrap_cache()
    db = tmp_path / "m.sqlite"
    conn = bootstrap(db)
    try:
        fid = upsert_file(conn, path="/x/a.png", size=1, mtime=0.0)
        with conn:
            upsert_embeddings(conn, [(fid, np.ones(4, np.float32))], model="clip-vit")
        assert ensure_embed_prep(conn, "clip-vit", "cc32") is False  # adopted
        assert conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0] == 1
        # recorded cc32 now; switching to derived prep invalidates
        assert ensure_embed_prep(conn, "clip-vit", "lb64->mean->32") is True
        assert conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0] == 0
        assert get_embed_prep(conn, "clip-vit") == "lb64->mean->32"
        # same prep again: no-op
        assert ensure_embed_prep(conn, "clip-vit", "lb64->mean->32") is False
    finally:
        conn.close()
