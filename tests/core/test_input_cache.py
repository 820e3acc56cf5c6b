"""Prepared-input cache: hit/miss keying and pipeline integration."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.core.pipeline.contracts import FileRecord
from kobato_eyes_tpu.core.pipeline.loaders import PreparedInputCache, PrefetchLoader
from kobato_eyes_tpu.db.connection import reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger

pytestmark = pytest.mark.integration


def _records(paths):
    return [
        FileRecord(file_id=i, path=p, size=p.stat().st_size, mtime=p.stat().st_mtime,
                   needs_tagging=True)
        for i, p in enumerate(paths)
    ]


def _run_loader(records, cache):
    prepare = lambda arrs: np.stack([a[:16, :16] for a in arrs])  # noqa: E731
    loader = PrefetchLoader(records, prepare=prepare, batch_size=2, io_workers=2, cache=cache)
    return [b for b in loader]


def test_cache_hits_on_second_pass(tmp_path, image_dir):
    root, paths = image_dir
    cache = PreparedInputCache(tmp_path / "cache")
    first = _run_loader(_records(paths), cache)
    assert cache.misses == len(paths) and cache.hits == 0
    second = _run_loader(_records(paths), cache)
    assert cache.hits == len(paths)
    a = np.concatenate([b.pixels for b in first])
    b = np.concatenate([b.pixels for b in second])
    np.testing.assert_array_equal(a, b)
    # width/height restored from cache
    for batch in second:
        for r, (w, h) in zip(batch.records, batch.sizes):
            assert w > 0 and h > 0


def test_cache_invalidated_by_mtime_change(tmp_path, image_dir):
    root, paths = image_dir
    cache = PreparedInputCache(tmp_path / "cache")
    recs = _records(paths)
    _run_loader(recs, cache)
    changed = _records(paths)
    changed[0].mtime += 100.0
    _run_loader(changed, cache)
    assert cache.misses == len(paths) + 1  # only the touched file re-decoded


def test_pipeline_with_cache_enabled(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    settings = Settings(
        pipeline=PipelineSettings(
            roots=[root], batch_size=2, io_workers=2,
            tagger_input_cache=True, input_cache_dir=tmp_path / "pc",
        )
    )
    db = tmp_path / "c.sqlite"
    s1 = run_index_once(db, settings, DummyTagger())
    assert s1.tagged == len(paths)
    assert any((tmp_path / "pc").rglob("*.npz"))


def test_corrupt_cache_entries_fall_back_to_decode(tmp_path, image_dir):
    """A truncated/garbage .npz is a miss (re-decode), never an exception;
    an unwritable cache degrades to pass-through (write failures are
    best-effort by policy)."""
    root, paths = image_dir
    cache = PreparedInputCache(tmp_path / "cache")
    first = _run_loader(_records(paths), cache)
    for f in (tmp_path / "cache").rglob("*.npz"):
        f.write_bytes(b"not an npz")
    cache2 = PreparedInputCache(tmp_path / "cache")
    second = _run_loader(_records(paths), cache2)
    assert cache2.hits == 0 and cache2.misses == len(paths)
    np.testing.assert_array_equal(
        np.concatenate([b.pixels for b in first]),
        np.concatenate([b.pixels for b in second]),
    )

    # unwritable cache dir: put() must swallow, loader still yields batches
    blocked = tmp_path / "blocked"
    blocked.write_text("a file, not a dir")
    cache3 = PreparedInputCache(blocked / "sub")
    third = _run_loader(_records(paths), cache3)
    assert sum(len(b.records) for b in third) == len(paths)
