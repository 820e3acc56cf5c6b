"""Parity tests for device pHash/dHash vs the numpy spec.

The spec mirrors the published reference formula (sig/phash.py:33-57):
32x32 LANCZOS grayscale -> orthonormal DCT-II -> 8x8 block -> bits = coeff >
mean(flat[1:]) -> MSB-first 64-bit word; dHash = 9x8 adjacent-column compare.
"""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.ops.phash import dct2_basis, dhash_batch, dhash_np, phash_batch, phash_np
from kobato_eyes_tpu.sig import dhash_image, hash_images, phash_image
from kobato_eyes_tpu.utils.bits import hamming64_int, to_signed64, u32pair_to_u64


def test_dct_basis_orthonormal():
    c = dct2_basis(32)
    np.testing.assert_allclose(c @ c.T, np.eye(32), atol=1e-12)


def test_dct_matches_naive_definition():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, size=(32, 32))
    c = dct2_basis(32)
    got = c @ x @ c.T
    # Naive O(n^4) DCT-II definition
    n = 32
    want = np.zeros((n, n))
    for k in range(8):  # check low-freq block only (what the hash uses)
        for l in range(8):
            sk = np.sqrt(1 / n) if k == 0 else np.sqrt(2 / n)
            sl = np.sqrt(1 / n) if l == 0 else np.sqrt(2 / n)
            acc = 0.0
            for m in range(n):
                for p in range(n):
                    acc += (
                        x[m, p]
                        * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
                        * np.cos(np.pi * (2 * p + 1) * l / (2 * n))
                    )
            want[k, l] = sk * sl * acc
    np.testing.assert_allclose(got[:8, :8], want[:8, :8], rtol=1e-10)


def test_phash_batch_matches_numpy_spec(rng):
    grays = rng.uniform(0, 255, size=(64, 32, 32)).astype(np.float32)
    device = u32pair_to_u64(np.asarray(phash_batch(grays)))
    for i in range(grays.shape[0]):
        want = phash_np(grays[i])
        assert hamming64_int(int(device[i]), want) == 0, f"image {i} hash mismatch"


def test_dhash_batch_matches_numpy_spec(rng):
    grays = rng.uniform(0, 255, size=(64, 8, 9)).astype(np.float32)
    device = u32pair_to_u64(np.asarray(dhash_batch(grays)))
    for i in range(grays.shape[0]):
        assert int(device[i]) == dhash_np(grays[i])


def test_phash_invariances(rng):
    """pHash must be stable to mild brightness scaling, distinct for noise."""
    base = rng.uniform(0, 255, size=(1, 32, 32)).astype(np.float32)
    scaled = np.clip(base * 1.1, 0, 255)
    h0 = int(u32pair_to_u64(np.asarray(phash_batch(base)))[0])
    h1 = int(u32pair_to_u64(np.asarray(phash_batch(scaled)))[0])
    assert hamming64_int(h0, h1) <= 6
    other = rng.uniform(0, 255, size=(1, 32, 32)).astype(np.float32)
    h2 = int(u32pair_to_u64(np.asarray(phash_batch(other)))[0])
    assert hamming64_int(h0, h2) > 10


def test_image_level_hashes_signed_range(sample_images):
    for img in sample_images:
        ph = phash_image(img)
        dh = dhash_image(img)
        assert -(1 << 63) <= ph < (1 << 63)
        assert -(1 << 63) <= dh < (1 << 63)


def test_hash_images_batch_consistent(sample_images):
    ph, dh = hash_images(sample_images)
    assert ph.shape == (len(sample_images), 2)
    singles = [phash_image(img) for img in sample_images]
    batch = [to_signed64(int(v)) for v in u32pair_to_u64(ph)]
    assert batch == singles


def test_identical_images_identical_hashes(rng):
    arr = rng.integers(0, 256, size=(50, 70, 3), dtype=np.uint8)
    img_a = Image.fromarray(arr, "RGB")
    img_b = Image.fromarray(arr.copy(), "RGB")
    assert phash_image(img_a) == phash_image(img_b)
    assert dhash_image(img_a) == dhash_image(img_b)
