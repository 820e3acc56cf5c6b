"""Batched perceptual hashing on device (pHash64 / dHash64).

TPU-native re-design of the reference hash pipeline (``src/sig/phash.py:33-57``
computed one image at a time through ``cv2.dct``):

- The 2-D DCT-II is expressed as two exact basis matmuls ``C @ X @ C.T`` so a
  whole batch of 32x32 grayscale tiles runs as one batched matmul on the MXU.
  A hand-written Pallas kernel would not beat XLA here -- a (B,32,32) batched
  matmul is precisely what the systolic array is for -- so the Pallas budget
  is spent on the all-pairs Hamming kernel instead (ops/hamming.py).
- Bit semantics match the reference exactly: 8x8 low-frequency block,
  threshold = mean of the flattened block excluding element 0, bits packed
  MSB-first into a 64-bit word, represented on device as (hi, lo) uint32
  pairs (no native u64 on TPU).
- dHash: 9x8 grayscale, adjacent-column compare, MSB-first packing
  (reference ``sig/phash.py:49-57``).

Host-side grayscale conversion + LANCZOS resize stays on CPU (PIL): it is a
per-image, dynamically-shaped operation the decode thread already touches,
and keeping it identical to the reference guarantees hash parity.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def dct2_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (float64): D = C @ X @ C.T.

    Matches cv2.dct's scaling convention (orthonormal DCT-II).
    """
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    basis = np.cos(np.pi * (2.0 * m + 1.0) * k / (2.0 * n))
    scale = np.full((n, 1), np.sqrt(2.0 / n))
    scale[0, 0] = np.sqrt(1.0 / n)
    return basis * scale


def pack_bits64(bits: jnp.ndarray) -> jnp.ndarray:
    """(B, 64) bool, MSB-first -> (B, 2) uint32 [hi, lo]."""
    weights = (jnp.uint32(1) << (31 - jnp.arange(32, dtype=jnp.uint32))).astype(jnp.uint32)
    b = bits.astype(jnp.uint32)
    hi = jnp.sum(b[:, :32] * weights, axis=1, dtype=jnp.uint32)
    lo = jnp.sum(b[:, 32:] * weights, axis=1, dtype=jnp.uint32)
    return jnp.stack([hi, lo], axis=-1)


@jax.jit
def phash_batch(gray: jnp.ndarray) -> jnp.ndarray:
    """Batched pHash64: (B, 32, 32) float32 grayscale -> (B, 2) uint32.

    Semantics of reference ``sig/phash.py:33-46``: DCT-II, top-left 8x8 block,
    bits = coeff > mean(flat[1:]), MSB-first packing.
    """
    c = jnp.asarray(dct2_basis(32), dtype=jnp.float32)
    x = gray.astype(jnp.float32)
    # (B,32,32) -> rows then cols; HIGHEST keeps true f32 accumulate on MXU.
    d = jnp.einsum("km,bmn,ln->bkl", c, x, c, precision=jax.lax.Precision.HIGHEST)
    block = d[:, :8, :8].reshape(-1, 64)
    mean = (jnp.sum(block, axis=1, keepdims=True) - block[:, :1]) / 63.0
    bits = block > mean
    return pack_bits64(bits)


@jax.jit
def dhash_batch(gray: jnp.ndarray) -> jnp.ndarray:
    """Batched dHash64: (B, 8, 9) float32 grayscale -> (B, 2) uint32.

    Semantics of reference ``sig/phash.py:49-57``: adjacent-column compare on
    an (h=8, w=9) grayscale, MSB-first packing.
    """
    diff = gray[:, :, 1:] > gray[:, :, :-1]
    return pack_bits64(diff.reshape(-1, 64))


# ---------------------------------------------------------------------------
# numpy reference implementations (the executable spec; used by parity tests
# and by the CPU fallback path)
# ---------------------------------------------------------------------------


def phash_np(gray: np.ndarray) -> int:
    """Single-image pHash64 reference on float64; returns unsigned int."""
    c = dct2_basis(32)
    d = c @ gray.astype(np.float64) @ c.T
    flat = d[:8, :8].reshape(64)
    mean = flat[1:].mean() if flat.size > 1 else flat.mean()
    bits = flat > mean
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    return value & 0xFFFFFFFFFFFFFFFF


def dhash_np(gray: np.ndarray) -> int:
    """Single-image dHash64 reference; gray is (8, 9) float."""
    diff = gray[:, 1:] > gray[:, :-1]
    value = 0
    for bit in diff.reshape(64):
        value = (value << 1) | int(bit)
    return value & 0xFFFFFFFFFFFFFFFF
