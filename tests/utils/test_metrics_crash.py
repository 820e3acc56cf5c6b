"""Metrics registry and crash handler plumbing."""

from __future__ import annotations

import subprocess
import sys
import time

from kobato_eyes_tpu.utils.metrics import MetricsRegistry


def test_counters_and_timers():
    m = MetricsRegistry()
    m.count("files")
    m.count("files", 4)
    assert m.counter("files") == 5
    with m.timer("work"):
        time.sleep(0.01)
    m.observe("work", 0.5)
    p = m.percentiles("work")
    assert p["count"] == 2
    assert p["p95"] >= p["p50"] > 0
    snap = m.snapshot()
    assert snap["counters"]["files"] == 5
    assert "work" in snap["timers"]
    m.reset()
    assert m.counter("files") == 0


def test_crash_handler_writes_log(tmp_path):
    """Run a crashing child process with handlers installed; crash.log fills."""
    script = f"""
import sys
sys.path.insert(0, {str(tmp_path.parent)!r})
from kobato_eyes_tpu.utils.crash import install_crash_handlers
install_crash_handlers({str(tmp_path)!r})
raise RuntimeError("intentional crash for test")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode != 0
    log = tmp_path / "crash.log"
    assert log.exists()
    content = log.read_text()
    assert "intentional crash for test" in content
    assert "unhandled exception" in content


def test_crash_handlers_in_process(tmp_path):
    """Thread excepthook + sys excepthook write structured entries; hooks are
    restored afterwards so the test harness keeps its own hooks."""
    import logging
    import sys
    import threading

    import faulthandler

    from kobato_eyes_tpu.utils import crash

    prev_sys_hook = sys.excepthook
    prev_thread_hook = threading.excepthook
    chained = []
    try:
        # a recording "previous" hook proves the installed hook chains to it
        sys.excepthook = lambda *a: chained.append(a)
        log_path = crash.install_crash_handlers(tmp_path)
        assert log_path == tmp_path / "crash.log"
        assert faulthandler.is_enabled()
        logging.getLogger("kobato_eyes_tpu.utils.crash").disabled = True

        # thread exception path: excepthook fires without killing the test
        def boom():
            raise ValueError("thread-kaboom")

        t = threading.Thread(target=boom, name="crashy")
        t.start()
        t.join()

        # unhandled-exception path, invoked the way the interpreter would
        try:
            raise RuntimeError("main-kaboom")
        except RuntimeError:
            sys.excepthook(*sys.exc_info())
        assert len(chained) == 1 and chained[0][1].args == ("main-kaboom",)
    finally:
        logging.getLogger("kobato_eyes_tpu.utils.crash").disabled = False
        sys.excepthook = prev_sys_hook
        threading.excepthook = prev_thread_hook
        faulthandler.disable()

    content = (tmp_path / "crash.log").read_text()
    assert "thread crashy exception" in content
    assert "thread-kaboom" in content
    assert "unhandled exception" in content
    assert "main-kaboom" in content
