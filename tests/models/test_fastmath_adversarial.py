"""Adversarial-weight numerics for the SHIPPED fast path.

The static-shift episode is the repo's own proof that random-init weights
hide weight-dependent numerics (probs_err 0.0025 and all-finite at random
init; 96 NaNs at production logit bounds — the kernel was deleted).  These
tests port that skepticism to the kernels that were KEPT: the full models
run with worst-case weights that drive attention logits to their production
ceilings (SwinV2: clamped logit scale 100 + CPB bias at its 16·sigmoid
ceiling, reference wd14_onnx.py:546-548; ViT: amplified LN gains + qkv),
and the fast forward (Pallas attention + tanh-gelu) must stay finite and
within a pinned probability deviation of the exact einsum/erf forward.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kobato_eyes_tpu.models.postprocess import probs_from_logits


def _amplify(params, rules):
    """Multiply/set leaves by path-substring rules: {substr: (op, value)}."""

    def visit(path, leaf):
        key = "/".join(str(k.key) for k in path)
        for substr, (op, value) in rules.items():
            if substr in key:
                if op == "mul":
                    return leaf * value
                if op == "set":
                    return jnp.full_like(leaf, value)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def test_vit_fast_path_finite_at_adversarial_weights():
    """Amplified LN gains + qkv kernels push ViT attention logits far past
    anything random init produces; the Pallas fast path must stay finite
    and probability-close to the exact forward."""
    from kobato_eyes_tpu.models.vit import ViT, init_params, vit_config

    base = vit_config(
        "tiny", image_size=64, patch_size=16, hidden_dim=64, depth=2,
        num_heads=4, mlp_dim=128, num_classes=32, dtype=jnp.float32,
    )
    params = init_params(base, seed=5)
    params = _amplify(params, {
        "ln1/scale": ("mul", 12.0),
        "ln2/scale": ("mul", 12.0),
        "attn/qkv/kernel": ("mul", 8.0),
        "ln_final/scale": ("mul", 6.0),
    })
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32))

    exact_logits = ViT(base).apply({"params": params}, x)
    fast_cfg = dataclasses.replace(base, attn_impl="pallas", act="gelu_tanh")
    fast_logits = ViT(fast_cfg).apply({"params": params}, x)

    exact = np.asarray(probs_from_logits(exact_logits))
    fast = np.asarray(probs_from_logits(fast_logits))
    assert np.isfinite(np.asarray(exact_logits)).all()
    assert np.isfinite(np.asarray(fast_logits)).all(), "fast path NaN/inf at adversarial weights"
    dev = float(np.max(np.abs(exact - fast)))
    # pinned adversarial bound: ~3x the measured random-weight headline
    # (0.007, docs/benchmarks.md) — regression here means the fast path got
    # numerically worse, not that the model got less accurate
    assert dev <= 0.02, f"exact-vs-fast prob deviation {dev} above adversarial bound"


def test_swin_fast_path_finite_at_production_logit_ceilings():
    """Every block at the cosine-attention worst case: logit_scale at its
    exp-clamp ceiling (100), CPB MLP saturated so the relative-position bias
    rides its 16·sigmoid ceiling, LN gains amplified.  The window kernel's
    static softmax shift must neither overflow nor zero a row through the
    FULL model (the kernel-level test covers isolated inputs; weights route
    real activations through every window/shift pattern)."""
    from kobato_eyes_tpu.models.swin import SwinV2, init_swin_params, swin_config

    base = swin_config(
        "tiny", image_size=128, patch_size=4, window_size=4, num_classes=16,
        dtype=jnp.float32,
    )
    params = init_swin_params(base, seed=7)
    params = _amplify(params, {
        "attn/logit_scale": ("set", float(np.log(1000.0))),  # clamps to 100
        "cpb_fc1/bias": ("set", 8.0),
        "cpb_fc2/kernel": ("mul", 25.0),  # saturate the 16*sigmoid ceiling
        "norm1/scale": ("mul", 10.0),
        "norm2/scale": ("mul", 10.0),
    })
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32))

    exact_logits = SwinV2(base).apply({"params": params}, x)
    fast_cfg = dataclasses.replace(base, attn_impl="pallas")
    fast_logits = SwinV2(fast_cfg).apply({"params": params}, x)

    assert np.isfinite(np.asarray(exact_logits)).all()
    assert np.isfinite(np.asarray(fast_logits)).all(), "window kernel NaN/inf at logit ceilings"
    exact = np.asarray(probs_from_logits(exact_logits))
    fast = np.asarray(probs_from_logits(fast_logits))
    dev = float(np.max(np.abs(exact - fast)))
    assert dev <= 0.02, f"exact-vs-fast prob deviation {dev} above adversarial bound"


def test_tagger_fastmath_deviation_reported_by_validate():
    """validate_checkpoint's parity stage measures the same exact-vs-fast
    deviation push-button style (VERDICT r3 #4: real weights day-one)."""
    from kobato_eyes_tpu.models.tagger import WD14Tagger, save_checkpoint
    from kobato_eyes_tpu.models.validate import validate_checkpoint
    import tempfile

    t = WD14Tagger(arch="vit", preset="tiny", image_size=64, fast_math=False)
    with tempfile.TemporaryDirectory() as td:
        ckpt = f"{td}/ckpt"
        save_checkpoint(ckpt, t.params)
        report = validate_checkpoint(
            ckpt, arch="vit", preset="tiny", image_size=64,
            classes=len(t.labels), n_images=4,
        )
    assert report["finite"] is True
    assert report["max_prob_deviation"] <= report["prob_tolerance"]
    assert report["ok"] is True, report
