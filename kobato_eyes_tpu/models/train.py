"""Tagger training / fine-tuning: sharded multi-label BCE step.

The reference ships inference-only black boxes; a first-class framework needs
the training path too (fine-tuning taggers on local libraries).  The step is
a single ``jit`` over a (data, model) mesh: batch sharded on ``data``, params
partitioned by ``parallel.mesh`` rules on ``model`` — XLA inserts the
all-reduces (psum of grads over data, all-gathers for tensor-parallel
matmuls) over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from kobato_eyes_tpu.models.preprocess import PreprocessSpec, normalize_on_device
from kobato_eyes_tpu.models.vit import ViT, ViTConfig


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    label_smoothing: float = 0.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.0) -> jnp.ndarray:
    """Mean sigmoid binary cross-entropy over (B, C) multi-hot labels."""
    labels = labels.astype(jnp.float32)
    if smoothing > 0.0:
        labels = labels * (1.0 - smoothing) + 0.5 * smoothing
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def make_train_step(
    vit_cfg: ViTConfig | None,
    spec: PreprocessSpec,
    train_cfg: TrainConfig = TrainConfig(),
    *,
    model: Any = None,
):
    """Returns ``step(params, opt_state, batch_u8, labels) -> (params,
    opt_state, loss)``; shard inputs/params before calling and jit does the
    rest (GSPMD partitioning).

    Pass ``model`` explicitly to fine-tune any backbone (SwinV2, the CLIP
    encoder, ...); otherwise a ViT is built from ``vit_cfg``.
    """
    if model is None:
        model = ViT(vit_cfg)
    tx = make_optimizer(train_cfg)

    def loss_fn(params: Any, batch_u8: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        x = normalize_on_device(batch_u8, spec)
        logits = model.apply({"params": params}, x)
        return bce_loss(logits, labels, train_cfg.label_smoothing)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch_u8, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_u8, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx
