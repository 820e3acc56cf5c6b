"""Watcher pipeline and single-image tag job."""

from __future__ import annotations

import time

import pytest

from kobato_eyes_tpu.core.tag_job import run_tag_job
from kobato_eyes_tpu.core.watcher import ProcessingPipeline, resolve_watch_paths
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger

pytestmark = pytest.mark.integration


def test_run_tag_job_end_to_end(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "t.sqlite"
    result = run_tag_job(db, DummyTagger(), paths[0])
    assert result.tagged and result.file_id is not None
    conn = bootstrap(db)
    try:
        row = conn.execute("SELECT * FROM files WHERE id=?", (result.file_id,)).fetchone()
        assert row["sha256"] and row["tagger_sig"]
        assert conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()[0] == 1
        sig = conn.execute("SELECT * FROM signatures WHERE file_id=?", (result.file_id,)).fetchone()
        assert sig["phash_u64"] is not None
    finally:
        conn.close()


def test_run_tag_job_undecodable(tmp_path):
    reset_bootstrap_cache()
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    result = run_tag_job(tmp_path / "t.sqlite", DummyTagger(), bad)
    assert not result.tagged and result.reason == "undecodable"


def test_resolve_watch_paths(tmp_path):
    a = tmp_path / "a"
    sub = a / "nested"
    b = tmp_path / "b"
    for d in (a, sub, b):
        d.mkdir()
    kept = resolve_watch_paths([sub, a, b, a])
    assert kept == sorted([a.absolute(), b.absolute()])


def test_pipeline_enqueue_and_poll(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "w.sqlite"
    results = {}
    pipe = ProcessingPipeline(
        db, DummyTagger(), on_result=lambda p, r: results.__setitem__(p, r)
    )
    handles = [pipe.enqueue_file(p) for p in paths]
    assert pipe.enqueue_file(root / "notes.txt") is None  # filtered extension
    for h in handles:
        assert h.result(timeout=20).tagged
    pipe.stop()
    assert len(results) == len(paths)
    conn = bootstrap(db)
    try:
        assert conn.execute("SELECT COUNT(*) FROM files").fetchone()[0] == len(paths)
    finally:
        conn.close()


def test_pipeline_polling_picks_up_files(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "p.sqlite"
    pipe = ProcessingPipeline(db, DummyTagger())
    pipe.start_polling([root], interval=0.1)
    deadline = time.monotonic() + 20
    try:
        while time.monotonic() < deadline:
            conn = bootstrap(db)
            try:
                n = conn.execute("SELECT COUNT(*) FROM files").fetchone()[0]
            finally:
                conn.close()
            if n >= len(paths):
                break
            time.sleep(0.1)
        assert n >= len(paths)
    finally:
        pipe.stop()


def test_resolve_watch_paths_skips_missing(tmp_path, caplog):
    real = tmp_path / "real"
    real.mkdir()
    kept = resolve_watch_paths([real, tmp_path / "ghost"])
    assert kept == [real]  # missing path warned away, never raises


def test_on_result_callback_failure_isolated(tmp_path, image_dir):
    """A raising on_result callback must not poison the tag job itself
    (failure policy: observers are best-effort)."""
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "w.sqlite"
    bootstrap(db).close()
    calls = []

    def bad_callback(path, result):
        calls.append(path)
        raise RuntimeError("observer exploded")

    pipe = ProcessingPipeline(db, DummyTagger(), on_result=bad_callback)
    try:
        h = pipe.enqueue_file(paths[0])
        out = h.result(timeout=30)  # job still succeeds
        assert out.tagged and calls == [paths[0]]
    finally:
        pipe.stop()
