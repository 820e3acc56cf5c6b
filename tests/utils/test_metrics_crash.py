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
