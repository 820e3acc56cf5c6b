"""ProgressEmitter: throttling and self-disable on callback failure."""

from __future__ import annotations

from kobato_eyes_tpu.core.progress import IndexPhase, IndexProgress, ProgressEmitter


def test_throttles_small_steps():
    seen = []
    emitter = ProgressEmitter(seen.append, min_step=0.10, min_interval=9999)
    for done in range(101):
        emitter.emit(IndexProgress(IndexPhase.TAG, done, 100))
    # ~every 10% plus the first; far fewer than 101
    assert 5 <= len(seen) <= 15


def test_force_and_phase_bypass_throttle():
    seen = []
    emitter = ProgressEmitter(seen.append, min_step=1.0, min_interval=9999)
    emitter.phase(IndexPhase.SCAN, 0, 10)
    emitter.phase(IndexPhase.TAG, 0, 10)
    assert [p.phase for p in seen] == [IndexPhase.SCAN, IndexPhase.TAG]


def test_callback_failure_disables_not_raises():
    calls = []

    def boom(progress):
        calls.append(progress)
        raise RuntimeError("consumer broke")

    emitter = ProgressEmitter(boom)
    emitter.phase(IndexPhase.SCAN)  # raises inside, swallowed, disables
    emitter.phase(IndexPhase.TAG)  # no further delivery
    assert len(calls) == 1


def test_none_callback_noop():
    emitter = ProgressEmitter(None)
    emitter.phase(IndexPhase.DONE)  # must not raise
