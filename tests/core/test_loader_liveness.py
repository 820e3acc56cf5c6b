"""Liveness: abandoned consumers and dead writers must not deadlock."""

from __future__ import annotations

import time

import numpy as np
import pytest

from kobato_eyes_tpu.core.pipeline.contracts import FileRecord, WriteItem
from kobato_eyes_tpu.core.pipeline.loaders import PrefetchLoader
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.services.writer import CatalogWriter, WriterError

pytestmark = pytest.mark.integration


def test_abandoned_iterator_releases_producer(image_dir):
    root, paths = image_dir
    records = [
        FileRecord(i, p, p.stat().st_size, p.stat().st_mtime, needs_tagging=True)
        for i, p in enumerate(paths * 5)  # more batches than prefetch depth
    ]
    loader = PrefetchLoader(
        records,
        prepare=lambda arrs: np.stack([a[:8, :8] for a in arrs]),
        batch_size=1, prefetch_depth=1, io_workers=1,
    )
    it = iter(loader)
    next(it)  # start the producer, take one batch
    it.close()  # abandon mid-stream (generator close runs the finally)
    deadline = time.monotonic() + 10
    while loader._thread.is_alive() and time.monotonic() < deadline:
        time.sleep(0.05)
    assert not loader._thread.is_alive(), "producer thread leaked after abandonment"


def test_dead_writer_does_not_deadlock_producers(tmp_path):
    reset_bootstrap_cache()
    db = tmp_path / "w.sqlite"
    bootstrap(db).close()
    w = CatalogWriter(db, queue_size=2, flush_chunk=1)
    w.start()
    # poison: nonexistent file id -> FK failure kills the writer thread
    w.put(WriteItem(999_999, [("t", 0.9, 0)], 1, 1, "s", time.time()))
    with pytest.raises(WriterError):
        # keep pushing: must surface the failure, never hang on a full queue
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            w.put(WriteItem(999_998, [("t", 0.9, 0)], 1, 1, "s", time.time()),
                  timeout=5.0)
        raise AssertionError("writer failure never surfaced")
    with pytest.raises(WriterError):
        w.stop()
