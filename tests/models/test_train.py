"""Training step: loss decreases on a learnable synthetic task."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from kobato_eyes_tpu.models.preprocess import PreprocessSpec
from kobato_eyes_tpu.models.train import TrainConfig, bce_loss, make_train_step
from kobato_eyes_tpu.models.vit import init_params, vit_config


def test_bce_loss_basics():
    logits = jnp.array([[10.0, -10.0]])
    labels = jnp.array([[1.0, 0.0]])
    assert float(bce_loss(logits, labels)) < 1e-3
    assert float(bce_loss(-logits, labels)) > 5.0


def test_train_step_learns():
    # local generator: the shared session rng's state depends on test order,
    # and this assertion is sensitive to the sampled batch
    rng = np.random.default_rng(42)
    cfg = vit_config(
        "tiny", image_size=32, patch_size=16, hidden_dim=64, depth=2,
        num_heads=4, mlp_dim=128, num_classes=8, dtype=jnp.float32,
    )
    spec = PreprocessSpec("wd14", 32)
    step, tx = make_train_step(cfg, spec, TrainConfig(learning_rate=3e-3))
    params = init_params(cfg, seed=0)
    opt_state = tx.init(params)

    # fixed batch with fixed labels: loss must drop substantially
    images = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray((rng.uniform(size=(8, 8)) < 0.3).astype(np.float32))
    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, images, labels)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    # memorizing one fixed batch: loss must drop clearly
    assert float(loss) < first * 0.6, (first, float(loss))


def test_train_step_swin_backbone(rng):
    from kobato_eyes_tpu.models.swin import SwinV2, init_swin_params, swin_config

    cfg = swin_config(
        "tiny", image_size=32, patch_size=4, window_size=4,
        embed_dim=32, depths=(2,), num_heads=(2,), num_classes=8, dtype=jnp.float32,
    )
    spec = PreprocessSpec("wd14", 32)
    step, tx = make_train_step(None, spec, TrainConfig(), model=SwinV2(cfg))
    params = init_swin_params(cfg)
    opt_state = tx.init(params)
    images = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    labels = jnp.zeros((4, 8), jnp.float32)
    params, opt_state, loss = step(params, opt_state, images, labels)
    assert np.isfinite(float(loss))
