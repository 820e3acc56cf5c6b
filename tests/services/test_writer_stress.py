"""Writer + quiesce stress breadth (reference
``tests/services/test_db_writing_service.py``, 1081 LoC — the concurrency
surface this suite mirrors: failure injection mid-run, backpressure under a
tiny queue, restart cycles, discard-on-stop, quiesce contention, flush
atomicity under random faults).

All tests are ``stress``-marked (excluded from the default run, opted in via
``pytest -m stress``) except the fast discard/restart checks.
"""

from __future__ import annotations

import random
import sqlite3
import threading
import time

import pytest

from kobato_eyes_tpu.core.pipeline.contracts import WriteItem
from kobato_eyes_tpu.db.connection import (
    QuiesceError,
    begin_quiesce,
    bootstrap,
    connect,
    end_quiesce,
    is_quiesced,
    reset_bootstrap_cache,
)
from kobato_eyes_tpu.db.repository import upsert_file
from kobato_eyes_tpu.services import writer as writer_mod
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


def _count_tagged(db) -> int:
    conn = bootstrap(db)
    try:
        return conn.execute("SELECT COUNT(DISTINCT file_id) FROM file_tags").fetchone()[0]
    finally:
        conn.close()


def test_stop_without_flush_discards_buffer(db):
    ids = _seed_files(db, 8)
    w = CatalogWriter(db, flush_chunk=1000)
    w.start()
    for fid in ids[:4]:
        w.put(_item(fid))
    w.flush()
    for fid in ids[4:]:
        w.put(_item(fid))
    # wait until the flushed half is visible, then drop the rest
    deadline = time.monotonic() + 10
    while w.flushes < 1 and time.monotonic() < deadline:
        time.sleep(0.01)
    w.stop(flush=False)
    assert _count_tagged(db) == 4


def test_restart_cycles_accumulate(db):
    ids = _seed_files(db, 30)
    for cycle in range(3):
        w = CatalogWriter(db, flush_chunk=4)
        w.start()
        for fid in ids[cycle * 10 : (cycle + 1) * 10]:
            w.put(_item(fid))
        w.stop(flush=True)
    assert _count_tagged(db) == 30


@pytest.mark.stress
def test_failure_mid_run_unblocks_all_producers(db, monkeypatch):
    """A writer that dies mid-run must surface the failure to every blocked
    producer instead of deadlocking them on a full queue."""
    ids = _seed_files(db, 400)
    real = writer_mod.write_tagging_batch
    calls = {"n": 0}

    def flaky(conn, items, *, tag_cache=None):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise sqlite3.OperationalError("injected mid-run failure")
        return real(conn, items, tag_cache=tag_cache)

    monkeypatch.setattr(writer_mod, "write_tagging_batch", flaky)
    w = CatalogWriter(db, queue_size=8, flush_chunk=16)
    w.start()

    errors: list[BaseException] = []
    sent = [0] * 4

    def producer(k: int):
        try:
            for fid in ids[k::4]:
                w.put(_item(fid), timeout=30)
                sent[k] += 1
        except WriterError as exc:
            errors.append(exc)

    threads = [threading.Thread(target=producer, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not any(t.is_alive() for t in threads), "producer deadlocked on dead writer"
    assert errors, "failure never propagated to producers"
    with pytest.raises(WriterError):
        w.stop()
    # the two successful flushes landed atomically (16 items each)
    assert _count_tagged(db) == 32


@pytest.mark.stress
def test_tiny_queue_backpressure_no_loss(db):
    """queue_size=2 with many producers: heavy backpressure, zero loss."""
    ids = _seed_files(db, 600)
    w = CatalogWriter(db, queue_size=2, flush_chunk=7)
    w.start()

    def producer(k: int):
        for fid in ids[k::6]:
            w.put(_item(fid), timeout=60)

    threads = [threading.Thread(target=producer, args=(k,)) for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    w.stop(flush=True)
    assert w.items_written == 600
    assert _count_tagged(db) == 600


@pytest.mark.stress
def test_random_fault_flushes_are_atomic(db, monkeypatch):
    """Random flush failures: whatever survives must be whole flush chunks —
    a failed flush may not leave a partial batch behind (single-transaction
    guarantee of write_tagging_batch)."""
    ids = _seed_files(db, 300)
    real = writer_mod.write_tagging_batch
    rng = random.Random(42)
    outcomes: list[int] = []  # sizes of successful flushes

    def flaky(conn, items, *, tag_cache=None):
        if rng.random() < 0.4:
            raise sqlite3.OperationalError("injected random fault")
        real(conn, items, tag_cache=tag_cache)
        outcomes.append(len(items))

    monkeypatch.setattr(writer_mod, "write_tagging_batch", flaky)
    w = CatalogWriter(db, queue_size=32, flush_chunk=10)
    w.start()
    try:
        for fid in ids:
            w.put(_item(fid), timeout=30)
        w.stop(flush=True)
    except WriterError:
        pass
    assert _count_tagged(db) == sum(outcomes)


@pytest.mark.stress
def test_quiesce_contention_invariants():
    """Concurrent quiesce/connect hammering: exactly one holder at a time,
    QuiesceError for connectors during a hold, no leaked state at the end
    (the conftest autouse fixture double-checks the leak)."""
    stop = threading.Event()
    holds = {"n": 0}
    errors: list[BaseException] = []
    lock = threading.Lock()

    def holder():
        while not stop.is_set():
            try:
                begin_quiesce()
            except QuiesceError:
                continue  # another holder won the race
            try:
                with lock:
                    holds["n"] += 1
                time.sleep(0.001)
            finally:
                end_quiesce()

    def prober(tmp):
        while not stop.is_set():
            try:
                conn = connect(tmp, wait_timeout=0.0)
                conn.close()
            except QuiesceError:
                pass
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        reset_bootstrap_cache()
        path = f"{d}/q.sqlite"
        bootstrap(path).close()
        threads = [threading.Thread(target=holder) for _ in range(3)] + [
            threading.Thread(target=prober, args=(path,)) for _ in range(3)
        ]
        for t in threads:
            t.start()
        time.sleep(1.5)
        stop.set()
        for t in threads:
            t.join(30)
    assert not errors, errors
    assert holds["n"] > 10, "quiesce was never acquired under contention"
    assert not is_quiesced(), "quiesce state leaked"


@pytest.mark.stress
def test_checkpoint_cadence_bounds_wal(db):
    """Standard (WAL) profile with many flushes: the -wal side file must stay
    bounded by the PASSIVE checkpoint cadence instead of growing with the
    total write volume."""
    ids = _seed_files(db, 200)
    w = CatalogWriter(db, flush_chunk=5, unsafe_fast=False)
    w.start()
    for fid in ids:
        w.put(_item(fid), timeout=30)
    w.stop(flush=True)
    wal = db.with_name(db.name + "-wal")
    if wal.exists():
        assert wal.stat().st_size < 8 * 1024 * 1024
    assert _count_tagged(db) == 200
