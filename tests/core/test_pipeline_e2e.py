"""End-to-end index pipeline: scan -> dummy tag -> write -> epoch -> search."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.core.progress import IndexPhase
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger
from kobato_eyes_tpu.query.engine import EpochManager, search_epoch

pytestmark = pytest.mark.integration


@pytest.fixture
def env(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "cat.sqlite"
    settings = Settings(pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2))
    return db, settings, root, paths


def test_full_index_run(env):
    db, settings, root, paths = env
    epochs = EpochManager()
    phases: list[IndexPhase] = []
    stats = run_index_once(
        db, settings, DummyTagger(),
        epoch_manager=epochs, progress=lambda p: phases.append(p.phase),
    )
    assert stats.scanned == len(paths)
    assert stats.new == len(paths)
    assert stats.tagged == len(paths)
    assert stats.written == len(paths)
    assert stats.epoch_version == 1
    assert IndexPhase.DONE in phases

    # search the fresh epoch: every image got the dummy "1girl" tag
    results = search_epoch(epochs.current, "1girl")
    assert len(results) == len(paths)
    assert all(r.relevance == pytest.approx(0.9) for r in results)


def test_incremental_rerun_skips(env):
    db, settings, root, paths = env
    stats1 = run_index_once(db, settings, DummyTagger())
    stats2 = run_index_once(db, settings, DummyTagger())
    assert stats1.tagged == len(paths)
    assert stats2.tagged == 0  # same fingerprint + unchanged files -> all skipped
    assert stats2.skipped == len(paths)


def test_changed_file_retags(env, rng):
    from PIL import Image

    db, settings, root, paths = env
    run_index_once(db, settings, DummyTagger())
    # rewrite one file with different content
    arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    Image.fromarray(arr, "RGB").save(paths[0])
    stats = run_index_once(db, settings, DummyTagger())
    assert stats.tagged == 1
    assert stats.skipped == len(paths) - 1


def test_missing_file_soft_deleted(env):
    db, settings, root, paths = env
    run_index_once(db, settings, DummyTagger())
    paths[0].unlink()
    stats = run_index_once(db, settings, DummyTagger())
    assert stats.missing == 1
    conn = bootstrap(db)
    try:
        present = conn.execute("SELECT COUNT(*) FROM files WHERE is_present=1").fetchone()[0]
        assert present == len(paths) - 1
    finally:
        conn.close()


def test_cancellation(env):
    db, settings, root, paths = env
    stats = run_index_once(db, settings, DummyTagger(), is_cancelled=lambda: True)
    assert stats.tagged == 0


def test_halving_retry_isolates_poison_image(env, tmp_path):
    """A failing batch splits recursively until the one poison image is
    isolated and skipped; every healthy image still gets tagged
    (reference tag_stage.py:200-214 halving retry)."""
    from PIL import Image

    db, settings, root, paths = env
    poison = root / "poison.png"
    Image.new("RGB", (32, 32), (255, 0, 0)).save(poison)  # pure red marker

    class FlakyTagger(DummyTagger):
        """Raises on multi-image batches and on the red poison image."""

        def prepare_batch_from_rgb(self, images):
            return np.stack([
                img.mean(axis=(0, 1), keepdims=True).astype(np.uint8)
                for img in images
            ])

        def infer_batch_prepared(self, batch, **kw):
            if batch.shape[0] > 1:
                raise RuntimeError("flaky backend: batch too big")
            px = batch[0, 0, 0]
            if px[0] > 200 and px[1] < 50 and px[2] < 50:
                raise RuntimeError("poison image")
            return super().infer_batch_prepared(batch, **kw)

    stats = run_index_once(db, settings, FlakyTagger())
    assert stats.tagged == len(paths)  # all healthy images made it
    assert stats.tag_failed == 1  # exactly the poison
    conn = bootstrap(db)
    try:
        row = conn.execute(
            "SELECT tagger_sig FROM files WHERE path = ?", (str(poison),)
        ).fetchone()
        assert row["tagger_sig"] is None  # never marked tagged
        n_tagged = conn.execute(
            "SELECT COUNT(*) FROM files WHERE tagger_sig IS NOT NULL"
        ).fetchone()[0]
        assert n_tagged == len(paths)
    finally:
        conn.close()


def test_pipelined_tagger_matches_sync(env):
    """With a real JaxTagger the tag stage runs the bounded in-flight
    pipeline (dispatch N batches before fetching the oldest); catalog rows
    must be identical to the per-batch sync path (pipeline_depth=1)."""
    from kobato_eyes_tpu.models.tagger import WD14Tagger

    db, settings, root, paths = env

    def run(depth, db_path):
        reset_bootstrap_cache()
        s = Settings(pipeline=PipelineSettings(
            roots=[root], batch_size=2, io_workers=2, pipeline_depth=depth,
        ))
        tagger = WD14Tagger(arch="vit", preset="tiny", image_size=64, fast_math=False)
        stats = run_index_once(db_path, s, tagger)
        conn = bootstrap(db_path)
        rows = conn.execute(
            "SELECT f.path, t.name, ft.score FROM file_tags ft "
            "JOIN files f ON f.id = ft.file_id JOIN tags t ON t.id = ft.tag_id "
            "ORDER BY f.path, t.name"
        ).fetchall()
        out = [(r["path"], r["name"], round(r["score"], 5)) for r in rows]
        conn.close()
        return stats, out

    stats_sync, rows_sync = run(1, db.parent / "sync.sqlite")
    stats_pipe, rows_pipe = run(3, db.parent / "pipe.sqlite")
    assert stats_pipe.tagged == stats_sync.tagged == len(paths)
    assert rows_pipe == rows_sync
    assert len(rows_pipe) > 0


def test_pipelined_completion_failure_falls_back_to_sync_retry(env, tmp_path):
    """A batch whose pipelined completion raises re-runs through the
    synchronous halving retry — terminal behavior identical to the sync
    path (failed image isolated, rest tagged)."""
    from kobato_eyes_tpu.models.tagger import WD14Tagger

    db, settings, root, paths = env

    class FlakyComplete(WD14Tagger):
        fails = 1

        def complete_batch_prepared(self, handle):
            if FlakyComplete.fails:
                FlakyComplete.fails -= 1
                raise RuntimeError("relay hiccup")
            return super().complete_batch_prepared(handle)

    reset_bootstrap_cache()
    s = Settings(pipeline=PipelineSettings(
        roots=[root], batch_size=2, io_workers=2, pipeline_depth=2,
    ))
    tagger = FlakyComplete(arch="vit", preset="tiny", image_size=64, fast_math=False)
    stats = run_index_once(db, s, tagger)
    # the failed completion re-ran synchronously: everything still tagged
    assert stats.tagged == len(paths)
    assert stats.tag_failed == 0
