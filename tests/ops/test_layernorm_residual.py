"""Residual-fused one-pass LayerNorm vs the XLA formulation."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from kobato_eyes_tpu.ops.pallas_layernorm_residual import (
    _pick_tile_rows,
    layernorm_residual,
)


def _ref(x, res, gamma, beta, eps=1e-5):
    xf = np.asarray(x, np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mean * mean
    y = (xf - mean) / np.sqrt(var + eps) * gamma + beta
    return np.asarray(res, np.float64) + y


@pytest.mark.parametrize("shape", [(448, 128), (32, 14, 14, 256), (896, 1024)])
def test_matches_reference(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32) * 3
    res = rng.normal(size=shape).astype(np.float32)
    c = shape[-1]
    gamma = rng.uniform(0.5, 2.0, c).astype(np.float32)
    beta = rng.normal(size=c).astype(np.float32)
    got = layernorm_residual(jnp.asarray(x), jnp.asarray(res), jnp.asarray(gamma), jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(got), _ref(x, res, gamma, beta), atol=2e-4)


def test_fallback_unaligned_channels():
    # C=100 is not lane-aligned: the XLA fallback path must be numerically
    # identical, not an error
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 100)).astype(np.float32)
    res = rng.normal(size=(64, 100)).astype(np.float32)
    gamma = np.ones(100, np.float32)
    beta = np.zeros(100, np.float32)
    got = layernorm_residual(jnp.asarray(x), jnp.asarray(res), jnp.asarray(gamma), jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(got), _ref(x, res, gamma, beta), atol=2e-4)


def test_tile_divisors():
    assert _pick_tile_rows(401408) is not None  # SwinV2-B/448 stage-0 rows
    assert _pick_tile_rows(6272) is not None  # stage-3 rows
    assert _pick_tile_rows(7) is None  # no multiple-of-8 divisor


def test_swin_forward_parity_with_pallas_ln():
    from kobato_eyes_tpu.models.swin import SwinV2, init_swin_params, swin_config

    cfg = swin_config(
        "tiny", image_size=128, patch_size=4, window_size=4, num_classes=5,
        dtype=jnp.float32,
    )
    p = init_swin_params(cfg, seed=0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
    a = np.asarray(SwinV2(cfg).apply({"params": p}, x))
    b = np.asarray(
        SwinV2(dataclasses.replace(cfg, ln_impl="pallas_residual")).apply(
            {"params": p}, x
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-5)
