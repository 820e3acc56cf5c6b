"""Refresh / retag maintenance flows."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.core.pipeline.fingerprint import current_tagger_sig
from kobato_eyes_tpu.core.pipeline.maintenance import refresh_root, retag_all, retag_selection
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger

pytestmark = pytest.mark.integration


@pytest.fixture
def env(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "cat.sqlite"
    settings = Settings(pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2))
    run_index_once(db, settings, DummyTagger())
    return db, settings, root, paths


def test_refresh_picks_up_new_file(env, rng):
    db, settings, root, paths = env
    arr = rng.integers(0, 256, size=(30, 30, 3), dtype=np.uint8)
    new_path = root / "late_arrival.png"
    Image.fromarray(arr, "RGB").save(new_path)
    stats = refresh_root(db, settings, DummyTagger(), root)
    assert stats.tagged == 1


def test_refresh_soft_and_hard_delete(env):
    db, settings, root, paths = env
    paths[0].unlink()
    stats = refresh_root(db, settings, DummyTagger(), root)
    assert stats.missing == 1
    conn = bootstrap(db)
    try:
        assert conn.execute("SELECT COUNT(*) FROM files WHERE is_present=0").fetchone()[0] == 1
    finally:
        conn.close()

    paths[1].unlink()
    refresh_root(db, settings, DummyTagger(), root, hard_delete=True)
    conn = bootstrap(db)
    try:
        remaining = conn.execute("SELECT path FROM files").fetchall()
        assert all(r["path"] != str(paths[1]) for r in remaining)
    finally:
        conn.close()


def test_retag_all_and_rerun(env):
    db, settings, root, paths = env
    sig = current_tagger_sig(DummyTagger().signature_fields())
    cleared = retag_all(db, current_sig=sig)
    assert cleared == len(paths)
    stats = run_index_once(db, settings, DummyTagger())
    assert stats.tagged == len(paths)


def test_retag_all_force_vs_sig_scoped(env):
    db, settings, root, paths = env
    assert retag_all(db, current_sig="not-the-sig") == 0
    assert retag_all(db, force=True) == len(paths)


def test_retag_selection(env):
    db, settings, root, paths = env
    conn = bootstrap(db)
    try:
        ids = [int(r["id"]) for r in conn.execute("SELECT id FROM files ORDER BY id LIMIT 2")]
    finally:
        conn.close()
    stats = retag_selection(db, settings, DummyTagger(), ids)
    assert stats.tagged == 2
    assert stats.skipped == 0
