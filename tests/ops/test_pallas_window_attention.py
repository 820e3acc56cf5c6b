"""Window-resident SwinV2 attention kernel vs the einsum reference."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kobato_eyes_tpu.ops.pallas_window_attention import windowed_cosine_attention


def _ref(qkv, scale, bias, mask, H, n, nW):
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale[None, :, None, None]
    attn = attn + bias[None]
    if mask is not None:
        attn = attn.reshape(-1, nW, H, n, n) + mask[None, :, None]
        attn = attn.reshape(-1, H, n, n)
    w = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", w, v)


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize(
    "dims",
    [(2, 4, 49, 3, 16), (1, 16, 49, 4, 8), (2, 4, 196, 2, 32)],
)
def test_matches_einsum_reference(dims, masked):
    B, nW, n, H, hd = dims
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B * nW, n, 3, H, hd)).astype(np.float32))
    scale = jnp.asarray(np.exp(rng.uniform(1.0, 2.0, H)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, n, n)).astype(np.float32))
    mask = (
        jnp.asarray(
            np.where(rng.random((nW, n, n)) < 0.1, -100.0, 0.0).astype(np.float32)
        )
        if masked
        else None
    )
    want = _ref(qkv, scale, bias, mask, H, n, nW)
    got = windowed_cosine_attention(qkv, scale, bias, mask, n_windows=nW)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_static_shift_safe_at_production_bounds():
    """Worst-case SwinV2 logit bounds: clamped scale 100, CPB bias at its
    16*sigmoid ceiling, soft -100 shift mask.  The kernel's static softmax
    shift (no per-row max pass) must neither overflow nor zero a row."""
    B, nW, n, H, hd = 1, 4, 196, 2, 32
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(size=(B * nW, n, 3, H, hd)).astype(np.float32))
    scale = jnp.full((H,), 100.0, jnp.float32)  # exp-clamp ceiling
    bias = jnp.full((H, n, n), 16.0, jnp.float32)  # sigmoid ceiling
    # one window fully masked off-diagonal: rows survive on the diagonal only
    m = np.zeros((nW, n, n), np.float32)
    m[0] = -100.0
    np.fill_diagonal(m[0], 0.0)
    mask = jnp.asarray(m)
    want = _ref(qkv, scale, bias, mask, H, n, nW)
    got = windowed_cosine_attention(qkv, scale, bias, mask, n_windows=nW)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_swin_model_parity_with_pallas_attention():
    from kobato_eyes_tpu.models.swin import SwinV2, init_swin_params, swin_config

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
    base = swin_config("tiny", image_size=128, patch_size=4, window_size=4, num_classes=7)
    p = init_swin_params(base, seed=1)
    ref = np.asarray(SwinV2(base).apply({"params": p}, x))
    pal = swin_config(
        "tiny", image_size=128, patch_size=4, window_size=4, num_classes=7,
        attn_impl="pallas",
    )
    got = np.asarray(SwinV2(pal).apply({"params": p}, x))
    np.testing.assert_allclose(got, ref, atol=2e-2)
