"""Bit-exact cross-check of the device pHash against real cv2.dct.

SURVEY §7 lists "exact pHash parity: LANCZOS resize and cv2 DCT-II scaling
conventions must be replicated bit-for-bit" as a hard part.  The regular
parity tests compare against our own numpy formula; this suite closes the
loop against OpenCV itself (the binary the reference actually calls,
``src/sig/phash.py:38``).
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from PIL import Image

from kobato_eyes_tpu.ops.phash import dhash_batch, phash_batch
from kobato_eyes_tpu.sig.signatures import dhash_image, phash_image
from kobato_eyes_tpu.utils.bits import to_signed64, u32pair_to_u64


def _cv2_phash64(gray32: np.ndarray) -> int:
    """The reference pHash formula computed with real cv2.dct
    (grayscale 32x32 -> DCT -> 8x8 block -> bits = coeff > mean(flat[1:]))."""
    dct = cv2.dct(gray32.astype(np.float32))
    block = dct[:8, :8]
    flat = block.flatten()
    threshold = flat[1:].mean()
    bits = 0
    for value in flat:
        bits = (bits << 1) | int(value > threshold)
    return bits


def _cv2_dhash64(gray98: np.ndarray) -> int:
    """Adjacent-pixel compare, next > current (reference sig/phash.py:49-57:
    ``pixels[:, 1:] > pixels[:, :-1]``)."""
    bits = 0
    for row in range(8):
        for col in range(8):
            bits = (bits << 1) | int(gray98[row, col + 1] > gray98[row, col])
    return bits


@pytest.mark.parametrize("seed", range(6))
def test_phash_matches_cv2_dct_bit_for_bit(seed):
    rng = np.random.default_rng(seed)
    g32 = rng.uniform(0, 255, size=(4, 32, 32)).astype(np.float32)
    ours = u32pair_to_u64(np.asarray(phash_batch(g32)))
    for k in range(4):
        assert int(ours[k]) == _cv2_phash64(g32[k]), f"image {k} seed {seed}"


def test_dhash_matches_reference_formula(rng):
    g98 = rng.uniform(0, 255, size=(4, 8, 9)).astype(np.float32)
    ours = u32pair_to_u64(np.asarray(dhash_batch(g98)))
    for k in range(4):
        assert int(ours[k]) == _cv2_dhash64(g98[k])


def test_full_image_path_matches_cv2_pipeline(rng):
    """End-to-end: PIL image -> our signed-64 hashes == cv2-based formula."""
    arr = rng.integers(0, 256, size=(77, 123, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB")
    g32 = np.asarray(
        img.convert("L").resize((32, 32), Image.Resampling.LANCZOS), dtype=np.float32
    )
    g98 = np.asarray(
        img.convert("L").resize((9, 8), Image.Resampling.LANCZOS), dtype=np.float32
    )
    assert phash_image(img) == to_signed64(_cv2_phash64(g32))
    assert dhash_image(img) == to_signed64(_cv2_dhash64(g98))
