"""Pipeline-level incremental epoch: second run applies a delta swap."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger
from kobato_eyes_tpu.query.engine import EpochManager, build_epoch, search_epoch

pytestmark = pytest.mark.integration


def test_incremental_epoch_across_runs(tmp_path, image_dir, rng):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "c.sqlite"
    settings = Settings(pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2))
    epochs = EpochManager()

    s1 = run_index_once(db, settings, DummyTagger(), epoch_manager=epochs)
    assert s1.epoch_version == 1
    assert epochs.current.num_files == len(paths)

    # add one file, remove one file -> delta swap on the next run
    new_path = root / "added.png"
    Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), "RGB").save(new_path)
    paths[0].unlink()

    s2 = run_index_once(db, settings, DummyTagger(), epoch_manager=epochs)
    assert s2.epoch_version == 2
    assert s2.tagged == 1 and s2.missing == 1
    assert epochs.current.num_files == len(paths)  # -1 missing, +1 added

    # the delta epoch must equal a from-scratch snapshot
    conn = bootstrap(db)
    try:
        full = build_epoch(conn, version=99)
    finally:
        conn.close()
    a = [(r.file_id, r.path) for r in search_epoch(epochs.current, "1girl", order_by="id")]
    b = [(r.file_id, r.path) for r in search_epoch(full, "1girl", order_by="id")]
    assert a == b
