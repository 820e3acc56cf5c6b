"""Device profiling: trace capture, compiled-cost analysis, MFU.

Closes the reference's device-side observability story (per-session ORT
profiling, ``src/tagger/wd14_onnx.py:884-913``; session-options profiling
dir, ``wd14_runtime.py``) the JAX way:

- :func:`device_trace` captures a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto) around any block — the analog of an ORT profile
  session, but for XLA programs.
- :func:`compiled_cost` asks the compiled executable itself for its FLOP /
  byte footprint (``jit(f).lower(...).compile().cost_analysis()``) so
  throughput claims can be stated as measured-vs-roofline instead of
  analytical estimates.
- :func:`mfu` turns (flops, seconds) into model-flops-utilization against
  the device's published peak.
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path
from typing import Any, Callable, Iterator

logger = logging.getLogger(__name__)

# Published per-chip peak dense-matmul throughput, bf16 FLOP/s.  Keys are
# matched as substrings of jax.devices()[0].device_kind (lowercased).
PEAK_BF16_FLOPS: dict[str, float] = {
    "v6e": 918e12,
    "v5p": 459e12,
    "v5e": 197e12,  # a.k.a. v5 lite
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 45e12,
}


def device_peak_flops() -> float | None:
    """Peak bf16 FLOP/s of the first local device, or None if unknown."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    return None


@contextlib.contextmanager
def device_trace(outdir: str | Path | None) -> Iterator[None]:
    """Capture a jax.profiler trace into ``outdir`` (no-op when None).

    Degrades to a no-op with a warning if the backend refuses to profile
    (e.g. a relay that does not forward the profiler service).
    """
    if outdir is None:
        yield
        return
    import jax

    path = Path(outdir)
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(str(path))
    except Exception:
        # Failure policy: profiling is observability, never correctness —
        # a backend that cannot trace must not fail the workload.
        logger.warning("device trace unavailable on this backend", exc_info=True)
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            logger.info("device trace written to %s", path)
        except Exception:
            logger.warning("device trace finalization failed", exc_info=True)


def compiled_cost(fn: Callable[..., Any], *args: Any, **kwargs: Any) -> dict[str, float]:
    """FLOPs / bytes of the compiled executable for ``fn(*args)``.

    Returns a dict with whatever the backend reports (commonly ``flops``,
    ``bytes accessed``); empty when the backend offers no cost model.
    """
    import jax

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        analysis = compiled.cost_analysis()
    except Exception:
        logger.warning("cost analysis unavailable", exc_info=True)
        return {}
    if analysis is None:
        return {}
    # Some backends return a list with one entry per computation.
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else {}
    return {str(k): float(v) for k, v in dict(analysis).items()}


def mfu(flops: float, seconds: float, peak_flops: float | None = None) -> float | None:
    """Model-flops-utilization in [0,1]; None when the peak is unknown."""
    peak = peak_flops if peak_flops is not None else device_peak_flops()
    if not peak or seconds <= 0:
        return None
    return (flops / seconds) / peak


def roofline_summary(flops: float, seconds: float) -> dict[str, float | None]:
    """Achieved TFLOP/s + MFU for a measured (flops, wall) pair."""
    achieved = flops / seconds if seconds > 0 else 0.0
    util = mfu(flops, seconds)
    peak = device_peak_flops()
    return {
        "flops": flops,
        "seconds": seconds,
        "achieved_tflops": achieved / 1e12,
        "peak_tflops": (peak / 1e12) if peak else None,
        "mfu": util,
    }
