"""Head-resident Pallas attention vs the einsum reference (interpret mode)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kobato_eyes_tpu.ops.pallas_attention import (
    head_resident_attention,
    head_resident_attention_packed,
)


def _ref(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.mark.parametrize(
    "shape",
    [(2, 785, 4, 64), (1, 50, 3, 16), (2, 64, 2, 32), (1, 8, 1, 8)],
)
def test_matches_einsum_reference(shape):
    b, t, h, d = shape
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    scale = d**-0.5
    want = _ref(q, k, v, scale)
    got = head_resident_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    packed = head_resident_attention_packed(
        jnp.stack([q, k, v], axis=2), scale=scale
    )
    np.testing.assert_allclose(np.asarray(packed), np.asarray(want), atol=2e-5)


def test_bf16_path_and_dtype():
    rng = np.random.default_rng(1)
    shape = (2, 100, 2, 64)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.bfloat16) for _ in range(3))
    got = head_resident_attention(q, k, v, scale=0.125)
    assert got.dtype == jnp.bfloat16 and got.shape == shape
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), 0.125)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2
    )


def test_extreme_logits_finite_and_correct():
    """Production-bound logits (|scale·q·k| ~ 1e4, far past anything random
    init makes): the in-kernel row-max softmax must neither overflow exp nor
    zero a row, in f32 and in bf16 (where exp/sum reassociate)."""
    b, t, h, d = 1, 64, 2, 32
    rng = np.random.default_rng(3)
    u = rng.normal(size=(t, d))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    # aligned/anti-aligned rows at magnitude 100 -> logits in [-1e4, 1e4]
    sign = np.where(rng.random((t, 1)) < 0.5, 1.0, -1.0)
    q = np.broadcast_to((100.0 * u)[None, :, None, :], (b, t, h, d)).astype(np.float32)
    k = np.broadcast_to((100.0 * sign * u)[None, :, None, :], (b, t, h, d)).astype(np.float32)
    v = rng.normal(size=(b, t, h, d)).astype(np.float32)

    want = _ref(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 1.0)
    got = head_resident_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=1.0
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)

    got16 = head_resident_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), scale=1.0,
    )
    g16 = np.asarray(got16, np.float32)
    assert np.isfinite(g16).all(), "bf16 fast path NaN/inf at extreme logits"
    np.testing.assert_allclose(g16, np.asarray(want), atol=5e-2)


def test_softmax_rows_sum_consistency():
    """Attention output of constant v must be (near) constant: softmax rows
    normalize even at the unaligned T the kernel masks internally."""
    b, t, h, d = 1, 37, 2, 16
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.ones((b, t, h, d), jnp.float32) * 3.25
    got = head_resident_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), 3.25, rtol=1e-5)
