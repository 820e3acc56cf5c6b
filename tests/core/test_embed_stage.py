"""Embed stage: vectors persisted during indexing, incremental skips, ANN use."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.core.config.schema import IndexSettings, PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.core.pipeline.embed_stage import load_embeddings
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.index.flat import FlatIndex
from kobato_eyes_tpu.models.tagger import DummyTagger

pytestmark = pytest.mark.integration


@pytest.fixture
def env(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "c.sqlite"
    settings = Settings(
        pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2),
        index=IndexSettings(enabled=True, embed_dim=64, preset="tiny",
                            image_size=64, patch_size=16),
    )
    return db, settings, root, paths


def test_embed_during_index_and_incremental(env):
    db, settings, root, paths = env
    stats = run_index_once(db, settings, DummyTagger())
    assert stats.extra["embedded"] == len(paths)
    conn = bootstrap(db)
    try:
        ids, vecs = load_embeddings(conn)
    finally:
        conn.close()
    assert len(ids) == len(paths)
    assert vecs.shape == (len(paths), 64)
    # unit-normalized
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-4)

    # second run: nothing new to embed
    stats2 = run_index_once(db, settings, DummyTagger())
    assert stats2.extra["embedded"] == 0


def test_catalog_vectors_feed_ann(env):
    db, settings, root, paths = env
    run_index_once(db, settings, DummyTagger())
    conn = bootstrap(db)
    try:
        ids, vecs = load_embeddings(conn)
    finally:
        conn.close()
    idx = FlatIndex(vecs, ids=ids)
    scores, got = idx.search(vecs[:2], k=1)
    assert got[0][0] == ids[0] and got[1][0] == ids[1]  # self-query returns itself
