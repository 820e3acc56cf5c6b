"""Pallas TPU kernel: tiled all-pairs XOR+popcount Hamming distances.

The dense-compare primitive from SURVEY §2.2 ("tiled XOR+popcount all-pairs
Pallas kernel, uint32 lanes") as an explicit Pallas program: the (i, j) pair
space streams through VMEM in (TILE_I, TILE_J) blocks, each block computing
popcount(hi_i ^ hi_j) + popcount(lo_i ^ lo_j) on the VPU with the hash words
held in registers — no (N, N, 2) intermediate ever materializes in HBM,
which is what the equivalent jnp broadcast would do.

Production consumer: the cluster cohesion audit (``dup/audit.py``, surfaced
as ``ket dup --audit``) — full intra-cluster distance matrices that the
windowed candidate scan never materializes.  The candidate scan itself uses
the sorted windowed form (ops/hamming.py), which avoids the N² pair space
entirely.  Falls back to interpreter mode off-TPU so tests run everywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kobato_eyes_tpu.utils.bits import popcount64_np, u64_to_u32pair

TILE_I = 256
TILE_J = 256


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount over uint32 lanes (Pallas-safe bit ops)."""
    x = x - ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    x = (x + (x >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> jnp.uint32(24)


def _hamming_tile_kernel(hi_i_ref, lo_i_ref, hi_j_ref, lo_j_ref, out_ref):
    """One (TILE_I, TILE_J) distance tile, entirely in VMEM."""
    hi_i = hi_i_ref[:]  # (TILE_I, 1)
    lo_i = lo_i_ref[:]
    hi_j = hi_j_ref[:]  # (1, TILE_J)
    lo_j = lo_j_ref[:]
    dist = _popcount(hi_i ^ hi_j) + _popcount(lo_i ^ lo_j)
    out_ref[:] = dist.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def _pairwise_kernel(hi_col, lo_col, hi_row, lo_row, *, interpret: bool):
    n_i = hi_col.shape[0]
    n_j = hi_row.shape[1]
    grid = (n_i // TILE_I, n_j // TILE_J)
    return pl.pallas_call(
        _hamming_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((n_i, n_j), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_I, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_I, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_J), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_J), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_I, TILE_J), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(hi_col, lo_col, hi_row, lo_row)


def pairwise_hamming(
    a_u64: np.ndarray, b_u64: np.ndarray | None = None, *, interpret: bool | None = None
) -> np.ndarray:
    """(Na,) x (Nb,) uint64 hashes -> (Na, Nb) int32 Hamming distance matrix."""
    if b_u64 is None:
        b_u64 = a_u64
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a = u64_to_u32pair(np.asarray(a_u64, dtype=np.uint64))
    b = u64_to_u32pair(np.asarray(b_u64, dtype=np.uint64))
    na, nb = a.shape[0], b.shape[0]
    pad_i = -na % TILE_I
    pad_j = -nb % TILE_J
    hi_col = jnp.asarray(np.pad(a[:, 0], (0, pad_i)).reshape(-1, 1))
    lo_col = jnp.asarray(np.pad(a[:, 1], (0, pad_i)).reshape(-1, 1))
    hi_row = jnp.asarray(np.pad(b[:, 0], (0, pad_j)).reshape(1, -1))
    lo_row = jnp.asarray(np.pad(b[:, 1], (0, pad_j)).reshape(1, -1))
    out = _pairwise_kernel(hi_col, lo_col, hi_row, lo_row, interpret=interpret)
    return np.asarray(out)[:na, :nb]


def pairwise_hamming_np(a_u64: np.ndarray, b_u64: np.ndarray | None = None) -> np.ndarray:
    """numpy executable spec."""
    if b_u64 is None:
        b_u64 = a_u64
    a = np.asarray(a_u64, dtype=np.uint64)
    b = np.asarray(b_u64, dtype=np.uint64)
    return popcount64_np(a[:, None] ^ b[None, :]).astype(np.int32)
