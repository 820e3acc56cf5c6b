"""Parity tests for tile-aHash, MAE, and SSIM device kernels."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.ops.mae import mae01_batch, mae01_np
from kobato_eyes_tpu.ops.ssim import ssim_batch, ssim_np
from kobato_eyes_tpu.ops.tile_hash import (
    tile_ahash_batch,
    tile_ahash_np,
    tile_hamming_words,
    words_to_int,
)


@pytest.mark.parametrize("grid,tile", [(4, 8), (8, 8), (8, 4), (16, 8)])
def test_tile_ahash_matches_reference_formula(rng, grid, tile):
    side = grid * tile
    batch = rng.integers(0, 256, size=(16, side, side), dtype=np.uint8)
    words = np.asarray(tile_ahash_batch(batch, grid=grid, tile=tile))
    for i in range(batch.shape[0]):
        assert words_to_int(words[i]) == tile_ahash_np(batch[i], grid, tile), f"row {i}"


def test_tile_ahash_boundary_exactness():
    # Craft a tile whose mean is exactly an integer: strict > must hold.
    side = 8  # grid=1 invalid; use grid=2,tile=4 -> side 8
    arr = np.full((side, side), 10, dtype=np.uint8)
    arr[0, 0] = 14  # tile (0,0) mean = (15*10+14)/16 = 10.25
    words = np.asarray(tile_ahash_batch(arr[None], grid=2, tile=4))
    assert words_to_int(words[0]) == tile_ahash_np(arr, 2, 4)
    # all-equal image -> all bits zero (strict >)
    flat = np.full((side, side), 77, dtype=np.uint8)
    words = np.asarray(tile_ahash_batch(flat[None], grid=2, tile=4))
    assert words_to_int(words[0]) == 0


def test_tile_hamming_words(rng):
    a = rng.integers(0, 1 << 32, size=(5, 4), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=(5, 4), dtype=np.uint64).astype(np.uint32)
    got = tile_hamming_words(a, b)
    for i in range(5):
        want = (words_to_int(a[i]) ^ words_to_int(b[i])).bit_count()
        assert int(got[i]) == want


def test_mae_batch_matches_reference(rng):
    a = rng.integers(0, 256, size=(8, 128, 128), dtype=np.uint8)
    b = rng.integers(0, 256, size=(8, 128, 128), dtype=np.uint8)
    got = mae01_batch(a, b)
    for i in range(8):
        assert got[i] == pytest.approx(mae01_np(a[i], b[i]), abs=0.0)


def test_mae_identical_is_zero(rng):
    a = rng.integers(0, 256, size=(2, 64, 64), dtype=np.uint8)
    assert np.all(mae01_batch(a, a.copy()) == 0.0)


def test_ssim_identical_is_one(rng):
    a = rng.uniform(0, 1, size=(3, 64, 64)).astype(np.float32)
    scores = np.asarray(ssim_batch(a, a.copy()))
    np.testing.assert_allclose(scores, 1.0, atol=1e-5)


def test_ssim_matches_numpy_spec(rng):
    a = rng.uniform(0, 1, size=(6, 48, 56)).astype(np.float32)
    noise = rng.normal(0, 0.08, size=a.shape).astype(np.float32)
    b = np.clip(a + noise, 0, 1)
    got = np.asarray(ssim_batch(a, b))
    for i in range(a.shape[0]):
        assert got[i] == pytest.approx(ssim_np(a[i], b[i]), abs=2e-4)


def test_ssim_orders_by_noise(rng):
    a = rng.uniform(0, 1, size=(1, 64, 64)).astype(np.float32)
    small = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), 0, 1)
    big = np.clip(a + rng.normal(0, 0.3, a.shape).astype(np.float32), 0, 1)
    s_small = float(np.asarray(ssim_batch(a, small))[0])
    s_big = float(np.asarray(ssim_batch(a, big))[0])
    assert s_small > s_big
    assert s_big < 0.7
