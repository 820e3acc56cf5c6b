"""Pallas tiled Hamming kernel vs numpy spec (interpret mode off-TPU)."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.ops.pallas_hamming import pairwise_hamming, pairwise_hamming_np


def test_square_matrix(rng):
    h = rng.integers(0, 1 << 64, size=300, dtype=np.uint64)  # non-multiple of tile
    got = pairwise_hamming(h)
    want = pairwise_hamming_np(h)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.int32
    assert (np.diag(got) == 0).all()


def test_rectangular(rng):
    a = rng.integers(0, 1 << 64, size=70, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=513, dtype=np.uint64)
    np.testing.assert_array_equal(pairwise_hamming(a, b), pairwise_hamming_np(a, b))


def test_known_values():
    a = np.array([0, 0xFFFFFFFFFFFFFFFF, 1], dtype=np.uint64)
    got = pairwise_hamming(a)
    assert got[0, 1] == 64
    assert got[0, 2] == 1
    assert got[1, 2] == 63
