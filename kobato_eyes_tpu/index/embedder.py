"""CLIP-style image embedder: ViT backbone + projection head, L2-normalized.

The embedding pass that feeds the ANN index (reference's planned-but-dormant
open_clip path, ``pyproject.toml:50-52``).  Weights load from an orbax
checkpoint or random-init for harness runs; the geometry (224px, patch 32,
512-d projection = CLIP ViT-B/32 class) matches the reference's declared
model family.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from kobato_eyes_tpu.models.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    PreprocessSpec,
    normalize_on_device,
    shortside_centercrop_rgb,
)
from kobato_eyes_tpu.models.vit import ViT, ViTConfig, vit_config

logger = logging.getLogger(__name__)


class ClipImageEncoder(nn.Module):
    cfg: ViTConfig
    embed_dim: int = 512

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        feat = ViT(self.cfg, name="vit")(images, features_only=True)
        proj = nn.Dense(
            self.embed_dim, use_bias=False,
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype, name="proj",
        )(feat)
        proj = proj.astype(jnp.float32)
        return proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-6)


class ImageEmbedder:
    """Host wrapper: prepare uint8 batches, run the jitted embedding pass."""

    def __init__(
        self,
        *,
        preset: str = "base",
        image_size: int = 224,
        patch_size: int = 32,
        embed_dim: int = 512,
        params: Any = None,
        checkpoint_path: str | Path | None = None,
        clip_variant: str | None = None,  # "openai" | "open_clip" | None
        seed: int = 0,
    ) -> None:
        # CLIP-visual tower geometry when a variant is named: ln_pre, no patch
        # bias, QuickGELU for OpenAI weights, CLIP's own mean/std statistics.
        variant_kw: dict[str, Any] = {}
        if clip_variant is not None:
            if clip_variant not in ("openai", "open_clip"):
                raise ValueError(f"unknown clip_variant {clip_variant!r}")
            variant_kw = dict(
                ln_pre=True,
                patch_bias=False,
                act="quick_gelu" if clip_variant == "openai" else "gelu",
            )
        self.cfg = vit_config(
            preset, image_size=image_size, patch_size=patch_size,
            num_classes=embed_dim, **variant_kw,
        )
        self.embed_dim = embed_dim
        mean, std = (CLIP_MEAN, CLIP_STD) if clip_variant else (None, None)
        self.spec = (
            PreprocessSpec(mode="pixai", size=image_size, mean=mean, std=std)
            if clip_variant
            else PreprocessSpec(mode="pixai", size=image_size)  # mean/std normalize
        )
        self._model = ClipImageEncoder(self.cfg, embed_dim=embed_dim)
        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            from kobato_eyes_tpu.models.tagger import load_checkpoint

            self.params = load_checkpoint(checkpoint_path)
        else:
            logger.info("embedder: random-init weights (%s, %dpx)", preset, image_size)
            dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            self.params = self._model.init(jax.random.PRNGKey(seed), dummy)["params"]

    @classmethod
    def from_clip_checkpoint(
        cls,
        state_dict_path: str | Path,
        *,
        clip_variant: str = "openai",
        preset: str = "base",
        image_size: int = 224,
        patch_size: int = 32,
        embed_dim: int = 512,
    ) -> "ImageEmbedder":
        """Build from a CLIP checkpoint (.pt/.safetensors/.onnx).

        Routed through ``import_torch_checkpoint`` so every release format
        (incl. the reference's ONNX graphs) loads with strict manifest
        validation instead of a deep KeyError on naming drift."""
        from kobato_eyes_tpu.models.import_weights import import_torch_checkpoint

        self = cls(
            preset=preset, image_size=image_size, patch_size=patch_size,
            embed_dim=embed_dim, clip_variant=clip_variant, params={},
        )
        self.params = import_torch_checkpoint(state_dict_path, self.cfg)
        return self

    def prepare_batch_from_rgb(self, images: Sequence[np.ndarray]) -> np.ndarray:
        return np.stack([shortside_centercrop_rgb(a, self.cfg.image_size) for a in images])

    @partial(jax.jit, static_argnames=("self",))
    def _embed(self, params: Any, batch_u8: jnp.ndarray) -> jnp.ndarray:
        x = normalize_on_device(batch_u8, self.spec)
        return self._model.apply({"params": params}, x)

    def embed_batch_prepared(self, batch_u8: np.ndarray) -> np.ndarray:
        return np.asarray(self._embed(self.params, jnp.asarray(batch_u8)))

    def embed_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        return self.embed_batch_prepared(self.prepare_batch_from_rgb(images))
