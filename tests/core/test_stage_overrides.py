"""DI seams: stage override and writer factory injection (reference
set_stage_override / TaggingDeps patterns)."""

from __future__ import annotations

import pytest

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline.contracts import FileRecord, ScanResult, WriteItem
from kobato_eyes_tpu.core.pipeline.orchestrator import IndexPipeline
from kobato_eyes_tpu.db.connection import reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger
from kobato_eyes_tpu.services.writer import WriterError

pytestmark = pytest.mark.integration


class FakeWriter:
    """Writer double recording items instead of touching the catalog."""

    def __init__(self, fail: bool = False):
        self.items: list[WriteItem] = []
        self.items_written = 0
        self.fail = fail

    def start(self):
        if self.fail:
            raise WriterError("injected start failure")

    def put(self, item, *, timeout=None):
        self.items.append(item)
        self.items_written += 1

    def stop(self, *, flush=True, timeout=None):
        pass

    def raise_if_failed(self):
        pass


def _pipeline(tmp_path, image_dir, writer):
    reset_bootstrap_cache()
    root, paths = image_dir
    settings = Settings(pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2))
    pipe = IndexPipeline(tmp_path / "c.sqlite", settings, DummyTagger())
    pipe.set_writer_factory(lambda: writer)
    return pipe, paths


def test_writer_factory_injection(tmp_path, image_dir):
    writer = FakeWriter()
    pipe, paths = _pipeline(tmp_path, image_dir, writer)
    stats = pipe.run()
    assert stats.tagged == len(paths)
    assert len(writer.items) == len(paths)
    assert all(w.tagger_sig == pipe.tagger_sig for w in writer.items)


def test_scan_override_bypasses_filesystem(tmp_path, image_dir):
    writer = FakeWriter()
    pipe, paths = _pipeline(tmp_path, image_dir, writer)

    def fake_scan(conn, emitter) -> ScanResult:
        # only the first file needs tagging
        r = ScanResult()
        p = paths[0]
        r.records.append(
            FileRecord(file_id=1, path=p, size=p.stat().st_size,
                       mtime=p.stat().st_mtime, needs_tagging=True)
        )
        return r

    pipe.set_scan_override(fake_scan)
    stats = pipe.run()
    assert stats.scanned == 1 and stats.tagged == 1
    assert len(writer.items) == 1


def test_writer_start_failure_propagates(tmp_path, image_dir):
    pipe, paths = _pipeline(tmp_path, image_dir, FakeWriter(fail=True))
    with pytest.raises(WriterError):
        pipe.run()
    # quiesce gate must be released even on failure
    from kobato_eyes_tpu.db.connection import is_quiesced

    assert not is_quiesced()