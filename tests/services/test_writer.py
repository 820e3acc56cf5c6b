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
