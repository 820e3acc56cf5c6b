"""Performance knobs (unroll, attn_impl) must not change ViT numerics."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from kobato_eyes_tpu.models.vit import ViT, init_params, vit_config


@pytest.mark.parametrize(
    "kw",
    [{"unroll": 4}, {"attn_impl": "fused"}, {"unroll": 4, "attn_impl": "fused"}],
)
def test_knobs_preserve_forward(kw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    base = vit_config("tiny", image_size=64, patch_size=16, num_classes=11)
    p = init_params(base, seed=1)
    ref = np.asarray(ViT(base).apply({"params": p}, x))
    cfg = vit_config("tiny", image_size=64, patch_size=16, num_classes=11, **kw)
    got = np.asarray(ViT(cfg).apply({"params": p}, x))
    # bf16 activations: fusion boundaries may reassociate rounding; fused
    # attention alone is bit-identical, unroll shifts at bf16 ulp scale
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_unknown_knob_values_rejected_at_config_time():
    """Typo'd knob values must raise, not silently run the slow fallback."""
    from kobato_eyes_tpu.models.swin import swin_config

    with pytest.raises(ValueError, match="attn_impl"):
        vit_config("tiny", attn_impl="palas")
    with pytest.raises(ValueError, match="act"):
        vit_config("tiny", act="geluu")
    with pytest.raises(ValueError, match="attn_impl"):
        swin_config("tiny", attn_impl="flash")  # vit-only impl name
    with pytest.raises(ValueError, match="qk_precision"):
        swin_config("tiny", qk_precision="high")
