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
    letterbox_square_rgb,
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
        derive_from: int | None = None,
    ) -> None:
        # Derived prep: accept the TAGGER's prepared tensor (white-letterbox
        # square at `derive_from` px, uint8) and downsample to `image_size`
        # on DEVICE with an f×f mean pool (f = derive_from / image_size; mean
        # pooling is the BOX/AREA resample the host letterbox path already
        # uses for downscales). This lets the index pipeline chain the
        # embedding forward onto the tagger's already-uploaded pixels — no
        # second decode pass, no second upload (the r5 cold-wall attribution:
        # the embed stage's own decode+upload pass was 23% of the cold index
        # wall, docs/benchmarks.md). Query-time prepare applies the SAME
        # letterbox so index- and query-vectors share one space; the prep is
        # recorded in the catalog meta table (db.repository.ensure_embed_prep).
        if derive_from is not None:
            if derive_from % image_size != 0 or derive_from < image_size:
                raise ValueError(
                    f"derive_from={derive_from} must be a multiple of image_size={image_size}"
                )
        self.derive_from = derive_from
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

    @property
    def prep_key(self) -> str:
        """Stable id of the prepared-tensor geometry feeding ``_embed``.

        Stored in the catalog meta table so query-time embedders reconstruct
        the exact index-time prep (``db.repository.ensure_embed_prep``)."""
        if self.derive_from is not None:
            return f"lb{self.derive_from}->mean->{self.cfg.image_size}"
        return f"cc{self.cfg.image_size}"

    @property
    def model_key(self) -> str:
        """Catalog ``embeddings.model`` key (prep provenance lives in meta)."""
        return "clip-vit"

    def accepts_prepared(self, side: int, mode: str) -> bool:
        """True when a tagger's prepared (side×side, ``mode`` geometry) batch
        is exactly this embedder's expected input — the fusion precondition."""
        if self.derive_from is not None:
            return mode == "wd14" and side == self.derive_from
        return False

    def prepare_batch_from_rgb(self, images: Sequence[np.ndarray]) -> np.ndarray:
        if self.derive_from is not None:
            return np.stack([letterbox_square_rgb(a, self.derive_from) for a in images])
        return np.stack([shortside_centercrop_rgb(a, self.cfg.image_size) for a in images])

    @partial(jax.jit, static_argnames=("self",))
    def _embed(self, params: Any, batch_u8: jnp.ndarray) -> jnp.ndarray:
        x = batch_u8
        if self.derive_from is not None:
            f = self.derive_from // self.cfg.image_size
            if f > 1:
                b, h, w, c = x.shape
                x = x.astype(jnp.float32).reshape(b, h // f, f, w // f, f, c).mean(axis=(2, 4))
        x = normalize_on_device(x, self.spec)
        return self._model.apply({"params": params}, x)

    # -- pipelined embedding (dispatch/complete split) ----------------------
    # Mirrors the tagger split (models/tagger.py): dispatch queues the
    # forward without syncing so the tag stage's bounded in-flight window
    # covers the embedding too; complete fetches with one device_get.

    def dispatch_batch_prepared(self, batch_u8) -> jnp.ndarray:
        """Queue the embedding forward WITHOUT syncing. ``batch_u8`` may be a
        host array or an already-device-resident one (fused tag+embed batches
        share a single upload)."""
        return self._embed(self.params, jnp.asarray(batch_u8))

    def complete_batch_prepared(self, pending: jnp.ndarray) -> np.ndarray:
        return np.asarray(jax.device_get(pending))

    def embed_batch_prepared(self, batch_u8: np.ndarray) -> np.ndarray:
        return self.complete_batch_prepared(self.dispatch_batch_prepared(batch_u8))

    def embed_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        return self.embed_batch_prepared(self.prepare_batch_from_rgb(images))


def embedder_from_catalog(
    conn,
    *,
    preset: str = "base",
    image_size: int = 224,
    patch_size: int = 32,
    embed_dim: int = 512,
    checkpoint_path: str | Path | None = None,
    model: str = "clip-vit",
) -> ImageEmbedder:
    """Embedder whose prep matches the catalog's STORED vectors.

    Query-time probe images (find-similar --query-image, /similar uploads)
    must be embedded with the exact preprocessing geometry the index run
    used — the catalog meta table records it (db.repository.ensure_embed_prep),
    so this factory is the one true way to build a query-side embedder."""
    from kobato_eyes_tpu.db.repository import get_embed_prep

    derive = None
    prep = get_embed_prep(conn, model)
    if prep and prep.startswith("lb"):
        head, _, target = prep.partition("->mean->")
        try:
            derive = int(head[2:])
            if target and int(target) != image_size:
                logger.warning(
                    "catalog vectors were computed at %spx but index.image_size=%d; "
                    "re-index to refresh them", target, image_size,
                )
                derive = None
        except ValueError:
            logger.warning("unparseable embed prep %r in catalog meta; using plain prep", prep)
            derive = None
        if derive is not None and derive % image_size != 0:
            logger.warning(
                "recorded embed prep %r incompatible with image_size=%d; using plain prep",
                prep, image_size,
            )
            derive = None
    return ImageEmbedder(
        preset=preset, image_size=image_size, patch_size=patch_size,
        embed_dim=embed_dim, checkpoint_path=checkpoint_path, derive_from=derive,
    )
