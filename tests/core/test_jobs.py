"""Job scheduler: priority order, cancellation, failure capture, shutdown."""

from __future__ import annotations

import threading
import time

import pytest

from kobato_eyes_tpu.core.jobs import (
    BatchJob,
    CallableJob,
    JobCancelled,
    JobManager,
    JobPriority,
)


@pytest.fixture
def manager():
    m = JobManager(max_workers=2)
    yield m
    m.shutdown()


def test_submit_and_result(manager):
    h = manager.submit(lambda: 40 + 2)
    assert h.result(timeout=5) == 42
    assert h.done()


def test_priority_order():
    m = JobManager(max_workers=1)
    try:
        order: list[str] = []
        gate = threading.Event()
        m.submit(lambda: gate.wait(5))  # occupy the single worker
        hb = m.submit(lambda: order.append("bg"), priority=JobPriority.BACKGROUND)
        hf = m.submit(lambda: order.append("fg"), priority=JobPriority.FOREGROUND)
        gate.set()
        hb.wait(5)
        hf.wait(5)
        assert order == ["fg", "bg"]
    finally:
        m.shutdown()


def test_failure_captured_not_fatal(manager):
    def boom():
        raise ValueError("nope")

    h = manager.submit(boom)
    h.wait(5)
    with pytest.raises(ValueError):
        h.result()
    # the worker survived
    assert manager.submit(lambda: 1).result(timeout=5) == 1


def test_cancel_before_run():
    m = JobManager(max_workers=1)
    try:
        gate = threading.Event()
        m.submit(lambda: gate.wait(5))
        h = m.submit(lambda: 123)
        h.cancel()
        gate.set()
        h.wait(5)
        with pytest.raises(JobCancelled):
            h.result()
    finally:
        m.shutdown()


def test_callable_job_is_cancelled_kwarg(manager):
    seen: list[bool] = []

    def fn(is_cancelled=None):
        seen.append(is_cancelled())
        return "ok"

    h = manager.submit_handle(CallableJob(fn))
    assert h.result(timeout=5) == "ok"
    assert seen == [False]


def test_batch_job_cooperative_cancel():
    class SlowBatch(BatchJob):
        name = "slow"

        def __init__(self):
            self.processed = []

        def load(self):
            return list(range(100))

        def process(self, item):
            time.sleep(0.005)
            self.processed.append(item)
            return item

    m = JobManager(max_workers=1)
    try:
        job = SlowBatch()
        h = m.submit_handle(job)
        time.sleep(0.05)
        h.cancel()
        h.wait(5)
        with pytest.raises(JobCancelled):
            h.result()
        assert 0 < len(job.processed) < 100  # stopped between items
    finally:
        m.shutdown()


def test_wait_for_done(manager):
    for _ in range(5):
        manager.submit(lambda: time.sleep(0.02))
    assert manager.wait_for_done(timeout=10)


def test_result_timeout_raises_while_running(manager):
    gate = threading.Event()
    h = manager.submit(lambda: gate.wait(10))
    with pytest.raises(TimeoutError, match="still running"):
        h.result(timeout=0.05)
    gate.set()
    assert h.result(timeout=5) is True


def test_submit_after_shutdown_rejected():
    m = JobManager(max_workers=1)
    m.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        m.submit(lambda: 1)


def test_shutdown_cancels_pending_handles():
    m = JobManager(max_workers=1)
    gate = threading.Event()
    running = m.submit(lambda: gate.wait(10))
    queued = [m.submit(lambda: 1) for _ in range(4)]
    time.sleep(0.05)  # let the worker pick up the blocker
    m.shutdown(cancel_pending=True, timeout=0.2)
    gate.set()
    cancelled = sum(isinstance(h.error, JobCancelled) for h in queued if h.done())
    assert cancelled >= 3  # all still-queued jobs got a JobCancelled error
    running.wait(5)


def test_wait_for_done_times_out(manager):
    gate = threading.Event()
    manager.submit(lambda: gate.wait(10))
    assert manager.wait_for_done(timeout=0.1) is False
    gate.set()
    assert manager.wait_for_done(timeout=5) is True
