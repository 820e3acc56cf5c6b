"""Preprocess conventions: geometry, normalization, preprocess.json parsing."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from kobato_eyes_tpu.models.preprocess import (
    PreprocessSpec,
    letterbox_square_rgb,
    normalize_on_device,
    prepare_batch,
    shortside_centercrop_rgb,
    spec_from_preprocess_json,
)


def test_letterbox_pads_white_and_centers(rng):
    arr = rng.integers(0, 200, size=(20, 40, 3), dtype=np.uint8)  # wide
    out = letterbox_square_rgb(arr, 40)
    assert out.shape == (40, 40, 3)
    assert (out[:10] == 255).all() and (out[30:] == 255).all()  # white bands
    np.testing.assert_array_equal(out[10:30], arr)


def test_centercrop_geometry(rng):
    arr = rng.integers(0, 255, size=(100, 60, 3), dtype=np.uint8)
    out = shortside_centercrop_rgb(arr, 50)
    assert out.shape == (50, 50, 3)


def test_wd14_normalization_is_bgr_0_255(rng):
    batch = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(normalize_on_device(jnp.asarray(batch), PreprocessSpec("wd14", 8)))
    np.testing.assert_array_equal(out[..., 0], batch[..., 2].astype(np.float32))
    np.testing.assert_array_equal(out[..., 2], batch[..., 0].astype(np.float32))
    assert out.max() > 1.0  # un-normalized


def test_pixai_normalization(rng):
    batch = rng.integers(0, 256, size=(1, 4, 4, 3), dtype=np.uint8)
    spec = PreprocessSpec("pixai", 4, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    out = np.asarray(normalize_on_device(jnp.asarray(batch), spec))
    want = (batch.astype(np.float32) / 255.0 - 0.5) / 0.25
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_prepare_batch_shapes(rng):
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in [(30, 50), (70, 20), (64, 64)]]
    out = prepare_batch(imgs, PreprocessSpec("wd14", 64))
    assert out.shape == (3, 64, 64, 3) and out.dtype == np.uint8


def test_preprocess_json(tmp_path):
    p = tmp_path / "preprocess.json"
    p.write_text(
        '{"stages": [{"type": "resize", "size": [384, 384]},'
        ' {"type": "normalize", "mean": [0.5, 0.4, 0.3], "std": [0.2, 0.2, 0.2]}]}'
    )
    spec = spec_from_preprocess_json(p)
    assert spec.size == 384
    assert spec.mean == (0.5, 0.4, 0.3)
    assert spec.std == (0.2, 0.2, 0.2)
    assert spec.mode == "pixai"
