"""Batched pixel mean-absolute-error on device.

Replacement for the reference's per-pair 128x128 grayscale MAE
(``src/ui/dup_refine_parallel.py:205-215``): absolute-difference sums for a
whole batch of (member, keeper) thumbnail pairs are computed on the VPU; the
final 0..1 normalisation and threshold compare happen on the host in float64
so the decision is bit-identical to ``np.mean(|a-b|)/255 <= thr``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def abs_diff_sums(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) uint8 pairs -> (B,) int32 sums of |a - b| (exact)."""
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.sum(d, axis=(1, 2), dtype=jnp.int32)


def mae01_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(B, H, W) uint8 pairs -> (B,) float64 MAE in 0..1 (reference order)."""
    sums = np.asarray(abs_diff_sums(jnp.asarray(a), jnp.asarray(b)), dtype=np.float64)
    n = a.shape[1] * a.shape[2]
    return (sums / n) / 255.0


def mae01_np(a: np.ndarray, b: np.ndarray) -> float:
    """Reference formula (dup_refine_parallel.py:211-213)."""
    return float(np.mean(np.abs(a.astype(np.int16) - b.astype(np.int16))) / 255.0)
