"""SwinV2 backbone: shapes, masking structure, tagger integration."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kobato_eyes_tpu.models.labels import synthetic_labels
from kobato_eyes_tpu.models.swin import (
    SwinV2,
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
    init_swin_params,
    swin_config,
)
from kobato_eyes_tpu.models.tagger import WD14Tagger


def _tiny_cfg(n_labels=64):
    # 32px, patch 4 -> grids 8,4; window 4; two stages
    return swin_config(
        "tiny", image_size=32, patch_size=4, window_size=4,
        embed_dim=32, depths=(2, 2), num_heads=(2, 4), num_classes=n_labels,
    )


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = 4
    windows = _window_partition(x, w)
    assert windows.shape == (2 * 4, 16, 16)
    back = _window_reverse(windows, w, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(grid=8, w=4, shift=2)
    assert mask.shape == (4, 16, 16)
    # SwinV2 soft mask value: -100.0 exactly (what pretrained weights expect)
    assert (mask == 0).any() and (mask == -100.0).any()
    assert set(np.unique(mask)) == {-100.0, 0.0}
    # diagonal always visible
    for wi in range(4):
        assert np.all(np.diag(mask[wi]) == 0)


def test_forward_shapes_and_determinism(rng):
    cfg = _tiny_cfg()
    params = init_swin_params(cfg, seed=0)
    model = SwinV2(cfg)
    x = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)).astype(jnp.float32)
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, 64)
    assert logits.dtype == jnp.float32
    feats = model.apply({"params": params}, x, features_only=True)
    assert feats.shape[0] == 2
    logits2 = model.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_swin_tagger_end_to_end(rng):
    labels = synthetic_labels(64)
    tagger = WD14Tagger(labels=labels, swin=_tiny_cfg(64), image_size=32, seed=0)
    assert "swinv2" in tagger.signature_fields()["arch"]
    imgs = [rng.integers(0, 256, size=(40, 50, 3), dtype=np.uint8) for _ in range(2)]
    results = tagger.infer_batch(imgs)
    assert len(results) == 2
    for r in results:
        for t in r.tags:
            thr = max(tagger.thresholds.get(int(t.category), 0.0), tagger.score_floor)
            assert t.score >= thr
