"""Catalog writer service: flush cadence, failure propagation, stop semantics.

The stress analog of the reference's largest test file
(``tests/services/test_db_writing_service.py``): worker exceptions must
surface at the producer, stop must flush, and concurrent producers must not
lose items.
"""

from __future__ import annotations

import threading
import time

import pytest

from kobato_eyes_tpu.core.pipeline.contracts import WriteItem
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import upsert_file
from kobato_eyes_tpu.services.writer import CatalogWriter, WriterError


@pytest.fixture
def db(tmp_path):
    reset_bootstrap_cache()
    path = tmp_path / "w.sqlite"
    conn = bootstrap(path)
    conn.close()
    return path


def _item(fid: int) -> WriteItem:
    return WriteItem(
        file_id=fid, tags=[("t", 0.9, 0)], width=1, height=1,
        tagger_sig="s", tagged_at=time.time(),
    )


def _seed_files(db, n: int) -> list[int]:
    conn = bootstrap(db)
    try:
        ids = [upsert_file(conn, path=f"/w/{i}.png") for i in range(n)]
        conn.commit()
        return ids
    finally:
        conn.close()


def test_stop_flushes_everything(db):
    ids = _seed_files(db, 10)
    w = CatalogWriter(db, flush_chunk=1000)  # larger than item count
    w.start()
    for fid in ids:
        w.put(_item(fid))
    w.stop(flush=True)
    conn = bootstrap(db)
    try:
        assert conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()[0] == 10
    finally:
        conn.close()
    assert w.items_written == 10


def test_flush_chunk_cadence(db):
    ids = _seed_files(db, 25)
    w = CatalogWriter(db, flush_chunk=10)
    w.start()
    for fid in ids:
        w.put(_item(fid))
    w.stop(flush=True)
    assert w.items_written == 25
    assert w.flushes == 3  # 10 + 10 + 5


def test_failure_propagates_to_producer(db):
    # foreign-key violation: file_id that doesn't exist
    w = CatalogWriter(db, flush_chunk=1)
    w.start()
    w.put(_item(999_999))
    deadline = time.monotonic() + 10
    with pytest.raises(WriterError):
        while time.monotonic() < deadline:
            w.raise_if_failed()
            time.sleep(0.01)
        raise AssertionError("writer failure never surfaced")
    with pytest.raises(WriterError):
        w.stop()


@pytest.mark.stress
def test_concurrent_producers_no_loss(db):
    n_producers, per_producer = 8, 200
    ids = _seed_files(db, n_producers * per_producer)
    w = CatalogWriter(db, queue_size=64, flush_chunk=128)
    w.start()

    def produce(start: int) -> None:
        for k in range(per_producer):
            w.put(_item(ids[start + k]))

    threads = [
        threading.Thread(target=produce, args=(i * per_producer,)) for i in range(n_producers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    w.stop(flush=True)
    conn = bootstrap(db)
    try:
        assert (
            conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()[0]
            == n_producers * per_producer
        )
    finally:
        conn.close()


def test_start_twice_rejected(db):
    w = CatalogWriter(db)
    w.start()
    with pytest.raises(RuntimeError):
        w.start()
    w.stop()


def test_unsafe_fast_falls_back_to_wal_when_locked(db):
    """Reference db_writing.py:235-257: when the exclusive lock is held by
    someone else, the unsafe-fast writer degrades to the WAL profile and the
    run still completes."""
    import sqlite3

    ids = _seed_files(db, 5)
    holder = sqlite3.connect(str(db))
    holder.execute("BEGIN IMMEDIATE")
    try:
        w = CatalogWriter(db, unsafe_fast=True)
        w.start()  # lock attempt fails -> WAL fallback (no exception)
        holder.execute("COMMIT")  # release so writes can proceed
        for fid in ids:
            w.put(_item(fid))
        w.stop(flush=True)
        w.raise_if_failed()
    finally:
        holder.close()
    conn = bootstrap(db)
    try:
        count = conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()[0]
        assert count == len(ids)
    finally:
        conn.close()


def test_wal_checkpoint_cadence_truncates(db, tmp_path):
    """Standard-profile writer checkpoints the WAL as it flushes; after a
    sizable run the WAL must not grow without bound."""
    ids = _seed_files(db, 600)
    w = CatalogWriter(db, unsafe_fast=False, flush_chunk=100)
    w.start()
    for fid in ids:
        w.put(_item(fid))
    w.flush()
    # give the idle maintenance a chance (cadence counters + idle sweep)
    time.sleep(1.2)
    w.stop(flush=True)
    w.raise_if_failed()
    wal = db.with_name(db.name + "-wal")
    # WAL either checkpointed away or small relative to the data written
    assert (not wal.exists()) or wal.stat().st_size < 8 * 1024 * 1024


def test_interleaved_flush_and_stop_under_contention(db):
    """Concurrent producers + explicit flush storms + reader contention must
    neither deadlock nor lose items (quiesce-free writer path)."""
    ids = _seed_files(db, 300)
    w = CatalogWriter(db, unsafe_fast=False, flush_chunk=32)
    w.start()
    errors: list[Exception] = []

    def produce(chunk):
        try:
            for fid in chunk:
                w.put(_item(fid))
                if fid % 50 == 0:
                    w.flush()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def read_loop():
        try:
            for _ in range(20):
                conn = bootstrap(db)
                conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()
                conn.close()
                time.sleep(0.01)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=produce, args=(ids[i::3],)) for i in range(3)
    ] + [threading.Thread(target=read_loop)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    w.stop(flush=True)
    w.raise_if_failed()
    assert not errors
    conn = bootstrap(db)
    try:
        assert conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()[0] == len(ids)
    finally:
        conn.close()


def test_stop_without_start_is_noop(db):
    w = CatalogWriter(db)
    w.stop()  # no thread: returns silently


def test_connect_failure_surfaces_at_start(tmp_path):
    # a directory path cannot be opened as a sqlite db -> the worker thread
    # fails during connect and start() must re-raise, not hang
    bad = tmp_path / "adir"
    bad.mkdir()
    w = CatalogWriter(bad)
    with pytest.raises(Exception):
        w.start()


def test_put_times_out_when_queue_full_and_writer_absent(db):
    w = CatalogWriter(db, queue_size=1)
    # no worker consuming: first put fills the queue, second must time out
    w._queue.put(_item(1))
    t0 = time.monotonic()
    with pytest.raises(WriterError, match="queue full"):
        w.put(_item(2), timeout=0.6)
    assert time.monotonic() - t0 < 5.0


def test_idle_maintenance_truncates_after_32_flushes(db):
    import sqlite3

    w = CatalogWriter(db, unsafe_fast=False)
    conn = sqlite3.connect(db)
    try:
        w._flushes_since_truncate = 32
        w._idle_maintenance(conn)
        assert w._flushes_since_truncate == 0
        # unsafe-fast profile skips maintenance entirely
        w2 = CatalogWriter(db, unsafe_fast=True)
        w2._flushes_since_truncate = 99
        w2._idle_maintenance(conn)
        assert w2._flushes_since_truncate == 99
    finally:
        conn.close()
