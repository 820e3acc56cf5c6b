"""SwinV2 backbone (flax.linen), TPU-first.

The WD14 tagger family's actual architecture (wd-v1-4-swinv2-tagger class;
the reference loads it as an ONNX black box, ``src/tagger/wd14_onnx.py``).
Faithful SwinV2 structure — cosine attention with learnable logit scale,
log-CPB relative position bias, post-norm residuals, shifted windows, patch
merging — implemented with static shapes throughout so XLA can tile every
window batch onto the MXU:

* window partition/reverse are pure reshapes/transposes;
* the shifted-window attention mask is a compile-time constant per stage;
* activations bf16, params f32, attention logits accumulate in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 448
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    # Window size the checkpoint was pretrained at (0 = same as window_size);
    # sets the CPB coordinate normalization denominator like SwinV2's
    # pretrained_window_sizes.
    pretrained_window_size: int = 0
    mlp_ratio: float = 4.0
    num_classes: int = 8192
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Performance knobs (see models/vit.py): "pallas" = window-resident
    # Pallas cosine attention (no HBM logits; TPU backend, interpret on CPU);
    # "gelu_tanh" = polynomial gelu that fuses into the matmul epilogue.
    attn_impl: str = "einsum"  # "einsum" | "pallas"
    act: str = "gelu"  # "gelu" | "gelu_tanh"
    # QK matmul precision inside the pallas window kernel. Measured ladder
    # on SwinV2-B/448 batch-32 (see ops/pallas_window_attention.py):
    # "default" 86.6 ms / probs_err 0.0021, "bf16" 87.2 ms / same err
    # (Mosaic's DEFAULT already runs f32 operands at 1-pass bf16 rate),
    # "highest" (exact 6-pass f32) 99.1 ms / err 0.0027 vs exact einsum.
    qk_precision: str = "default"
    # Post-norm LayerNorm implementation for the block residuals:
    # "pallas_residual" = one-pass LN with the residual add fused into the
    # kernel epilogue (ops/pallas_layernorm_residual.py) — the r3 retry
    # condition, measured r4: 97.4 -> 100.4 ms (NULL; XLA's fusion wins
    # even with the residual inside — see the kernel docstring). Keep the
    # default; the knob exists to re-measure on future hardware.
    ln_impl: str = "xla"  # "xla" | "pallas_residual"

    def __post_init__(self) -> None:
        # unknown knob values would otherwise silently fall through to the
        # slow einsum / exact-gelu branches
        if self.attn_impl not in ("einsum", "pallas"):
            raise ValueError(f"unknown attn_impl {self.attn_impl!r}")
        if self.act not in ("gelu", "gelu_tanh"):
            raise ValueError(f"unknown act {self.act!r}")
        if self.qk_precision not in ("default", "bf16", "highest"):
            raise ValueError(f"unknown qk_precision {self.qk_precision!r}")
        if self.ln_impl not in ("xla", "pallas_residual"):
            raise ValueError(f"unknown ln_impl {self.ln_impl!r}")

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def grid(self, stage: int) -> int:
        return self.image_size // self.patch_size // (2**stage)


_PRESETS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
}


def swin_config(preset: str = "base", **overrides: Any) -> SwinConfig:
    if preset not in _PRESETS:
        raise ValueError(f"unknown Swin preset {preset!r}; have {sorted(_PRESETS)}")
    kw: dict[str, Any] = dict(_PRESETS[preset])
    kw.update(overrides)
    cfg = SwinConfig(**kw)
    for s in range(cfg.num_stages):
        if cfg.grid(s) % cfg.window_size != 0:
            raise ValueError(
                f"stage {s} grid {cfg.grid(s)} not divisible by window {cfg.window_size}"
            )
    return cfg


def _window_partition(x: Array, w: int) -> Array:
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(x: Array, w: int, h: int, wd: int) -> Array:
    """(B*nW, w*w, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


def _relative_log_coords(w: int, pretrained_w: int = 0) -> np.ndarray:
    """(w*w, w*w, 2) log-spaced continuous relative coordinates (SwinV2 CPB).

    Exact SwinV2 convention (the one pretrained checkpoints were trained
    against): coordinates are normalized by (window - 1) of the *pretraining*
    window, scaled to [-8, 8], then sign(x)*log2(|x|+1)/log2(8).
    """
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"), axis=-1)
    flat = coords.reshape(-1, 2)
    rel = (flat[:, None, :] - flat[None, :, :]).astype(np.float32)
    denom = max((pretrained_w if pretrained_w > 0 else w) - 1, 1)
    rel = rel / denom * 8.0
    return np.sign(rel) * np.log2(np.abs(rel) + 1.0) / np.log2(8.0)


def _shift_attn_mask(grid: int, w: int, shift: int) -> np.ndarray:
    """(nW, w², w²) additive mask for shifted windows.

    Masked entries use the SwinV2 value of -100.0 (NOT -inf): cosine-attention
    logits are bounded by scale<=100 + bias<=16, and pretrained weights were
    trained against exactly this soft mask, so fidelity requires keeping it.
    """
    img = np.zeros((grid, grid), dtype=np.int32)
    cnt = 0
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    windows = img.reshape(grid // w, w, grid // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = windows[:, :, None] != windows[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    cfg: SwinConfig
    num_heads: int
    window_size: int
    num_windows: int = 0  # windows per image (needed by the pallas path)

    @nn.compact
    def __call__(self, x: Array, mask: Array | None) -> Array:
        cfg = self.cfg
        bnw, n, c = x.shape
        head_dim = c // self.num_heads
        qkv_layer = nn.DenseGeneral(
            features=(3, self.num_heads, head_dim),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv",
        )
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
            (self.num_heads, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))

        # log-CPB relative position bias: small MLP over log relative coords
        rel = jnp.asarray(
            _relative_log_coords(self.window_size, cfg.pretrained_window_size)
        )  # (n, n, 2)
        h1 = nn.Dense(512, dtype=jnp.float32, param_dtype=cfg.param_dtype, name="cpb_fc1")(rel)
        h1 = nn.relu(h1)
        bias = nn.Dense(
            self.num_heads, use_bias=False, dtype=jnp.float32,
            param_dtype=cfg.param_dtype, name="cpb_fc2",
        )(h1)  # (n, n, heads)
        bias = 16.0 * jax.nn.sigmoid(bias)

        if cfg.attn_impl == "pallas" and self.num_windows > 0:
            from kobato_eyes_tpu.ops.pallas_window_attention import (
                windowed_cosine_attention_packed,
            )

            # keep the window axis unflattened through qkv, and contract the
            # output projection directly on the kernel's head-major output —
            # both avoid whole-tensor relayout copies (trace-measured ~39.5 ms
            # of the 103 ms SwinV2-B/448 batch-32 forward was copies)
            xw = x.reshape(-1, self.num_windows, n, c)
            qkv = qkv_layer(xw)  # (B, nW, n, 3, H, hd)
            out = windowed_cosine_attention_packed(
                qkv, scale.reshape(self.num_heads), bias.transpose(2, 0, 1),
                mask, qk_precision=cfg.qk_precision,
            )  # (B, H, nW, n, hd)
            y = nn.DenseGeneral(
                features=c, axis=(1, 4), dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name="proj",
            )(out)  # (B, nW, n, c); kernel (H, hd, c) — identical param
            return y.reshape(bnw, n, c)
        else:
            qkv = qkv_layer(x)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            # SwinV2 cosine attention with learnable, clamped logit scale
            q = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
            k = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
            attn = attn * scale[None]
            attn = attn + bias.transpose(2, 0, 1)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(-1, nw, self.num_heads, n, n) + mask[None, :, None]
                attn = attn.reshape(-1, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(cfg.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return nn.DenseGeneral(
            features=c, axis=(-2, -1), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="proj",
        )(out)


class _ResidualPostNorm(nn.Module):
    """``shortcut + LayerNorm(x)`` with nn.LayerNorm's exact param tree
    ("scale"/"bias" under this module's name), routed to the residual-fused
    Pallas kernel when ``cfg.ln_impl == "pallas_residual"``."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, x: Array, shortcut: Array) -> Array:
        cfg = self.cfg
        c = x.shape[-1]
        # params defined HERE (not via a nested nn.LayerNorm) so the path is
        # <name>/scale|bias in both branches — checkpoints are impl-agnostic
        gamma = self.param("scale", nn.initializers.ones, (c,), cfg.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (c,), cfg.param_dtype)
        if cfg.ln_impl == "pallas_residual":
            from kobato_eyes_tpu.ops.pallas_layernorm_residual import (
                layernorm_residual,
            )

            return layernorm_residual(
                x, shortcut.astype(cfg.dtype), gamma, beta, eps=1e-5
            )
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        return shortcut.astype(cfg.dtype) + y.astype(cfg.dtype)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    num_heads: int
    grid: int
    shift: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        w = cfg.window_size
        b, h, wd, c = x.shape
        shortcut = x
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(self.grid, w, self.shift))
        else:
            mask = None
        windows = _window_partition(x, w)
        attn = WindowAttention(
            cfg, self.num_heads, w, num_windows=(self.grid // w) ** 2, name="attn"
        )(windows, mask)
        x = _window_reverse(attn, w, h, wd)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        # SwinV2 post-norm residuals (ln_impl routes to the residual-fused
        # Pallas LN; param tree is nn.LayerNorm's either way)
        x = _ResidualPostNorm(cfg, name="norm1")(x, shortcut)

        shortcut = x
        hdn = nn.Dense(int(c * cfg.mlp_ratio), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(x)
        hdn = nn.gelu(hdn, approximate=(cfg.act == "gelu_tanh"))
        hdn = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2")(hdn)
        return _ResidualPostNorm(cfg, name="norm2")(hdn, shortcut)


class PatchMerging(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.cfg.dtype,
                     param_dtype=self.cfg.param_dtype, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype, name="norm")(x)


class SwinV2(nn.Module):
    """SwinV2 image classifier; ``features_only=True`` returns pooled features."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, images: Array, *, features_only: bool = False) -> Array:
        cfg = self.cfg
        b, h, w, c = images.shape
        if h != cfg.image_size or w != cfg.image_size:
            raise ValueError(f"expected {cfg.image_size}px input, got {h}x{w}")
        x = images.astype(cfg.dtype)
        p = cfg.patch_size
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)
        x = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="patch_norm")(x)

        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            grid = cfg.grid(stage)
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(cfg, heads, grid, shift, name=f"stage{stage}_block{blk}")(x)
            if stage < cfg.num_stages - 1:
                x = PatchMerging(cfg, name=f"merge{stage}")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="norm_final")(x)
        feat = jnp.mean(x, axis=(1, 2))
        if features_only:
            return feat
        head = nn.Dense(cfg.num_classes, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head")
        return head(feat).astype(jnp.float32)


def init_swin_params(cfg: SwinConfig, seed: int = 0) -> Any:
    model = SwinV2(cfg)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


def swin_forward_flops(cfg: SwinConfig, batch_size: int, *, with_head: bool = True) -> float:
    """Analytic matmul FLOPs of one forward pass (2 FLOPs per MAC).

    Counts qkv/proj/mlp projections, windowed attention (QK + PV inside
    each window: 4*T*w^2*c per block), patch embed, patch-merging
    reductions, and the head; norms/CPB-MLP omitted (sub-1%). Same role as
    ``vit.vit_forward_flops`` for roofline/MFU accounting.
    """
    p = cfg.patch_size
    t0 = (cfg.image_size // p) ** 2
    total = 2.0 * t0 * (p * p * 3) * cfg.embed_dim  # patch embed
    for s, (depth, _heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        c = cfg.embed_dim * (2**s)
        t = (cfg.grid(s)) ** 2
        mlp = cfg.mlp_ratio * c
        per_block = (
            2 * t * c * 3 * c            # qkv
            + 4 * t * (cfg.window_size**2) * c  # windowed QK + PV
            + 2 * t * c * c              # out proj
            + 2 * 2 * t * c * mlp        # fc1 + fc2
        )
        total += depth * per_block
        if s < cfg.num_stages - 1:
            total += 2 * (t / 4) * (4 * c) * (2 * c)  # patch merging
    if with_head:
        total += 2 * cfg.embed_dim * (2 ** (cfg.num_stages - 1)) * cfg.num_classes
    return float(batch_size) * total
