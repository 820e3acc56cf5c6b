"""Vision Transformer backbone (flax.linen), TPU-first.

The reference taggers are ONNX black boxes of this class (WD14 = SwinV2/ViT
trained at 448 px; ``src/tagger/wd14_onnx.py:278-300`` infers the 448 input
from model metadata).  Here the backbone is a native JAX module designed for
the MXU:

* all matmuls are large and batched (patch-embed as one reshaped matmul,
  attention/MLP as einsums) — no scalar loops, no dynamic shapes;
* activations run in ``bfloat16`` with float32 params and float32 softmax/
  layernorm accumulation (``dtype`` / ``param_dtype`` split);
* the block stack is ``nn.scan``-compiled (one trace for all layers) and
  optionally rematerialized to trade FLOPs for HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Architecture hyperparameters.

    Defaults are ViT-B/16 at 448 px — the WD14-class operating point
    (8k-or-13k-label multi-label tagger, reference README performance table).
    """

    image_size: int = 448
    patch_size: int = 16
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 8192
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False
    pool: str = "cls"  # "cls" | "gap"
    # CLIP-visual variants (OpenAI/open_clip ViT towers): pre-transformer
    # LayerNorm, bias-less patch embedding, QuickGELU activation.
    ln_pre: bool = False
    patch_bias: bool = True
    act: str = "gelu"  # "gelu" | "quick_gelu"
    # Performance knobs (numerics-preserving):
    # unroll: lax.scan unroll factor for the block stack (depth = fully
    # unrolled — lets XLA schedule across layer boundaries at a compile-time
    # cost; 1 = the compact while-loop form).
    unroll: int = 1
    # attn_impl: "einsum" (explicit logits/softmax/weighted-sum),
    # "fused" (jax.nn.dot_product_attention, XLA's canonical attention),
    # "flash" (Pallas TPU flash-attention: online softmax, never
    # materializes the (T, T) logits in HBM — at 785 tokens the einsum form
    # writes+reads ~34 GB of f32 logits per ViT-B forward, which is the
    # measured 31%-MFU ceiling; TPU backend only),
    # "pallas" (head-resident Pallas attention, the production fast_math
    # path: one grid program per (batch, head) holds the full logits in
    # VMEM through softmax+PV and blocks straight into the packed qkv
    # output — 53% MFU on ViT-B/448; TPU backend, interpret on CPU).
    attn_impl: str = "einsum"

    def __post_init__(self) -> None:
        # unknown knob values would otherwise silently fall through to the
        # slow einsum / exact-gelu branches
        if self.attn_impl not in ("einsum", "fused", "flash", "pallas"):
            raise ValueError(f"unknown attn_impl {self.attn_impl!r}")
        if self.act not in ("gelu", "quick_gelu", "gelu_tanh"):
            raise ValueError(f"unknown act {self.act!r}")
        if self.pool not in ("cls", "gap"):
            raise ValueError(f"unknown pool {self.pool!r}")

    @property
    def num_patches(self) -> int:
        side = self.image_size // self.patch_size
        return side * side


_PRESETS: dict[str, dict[str, int]] = {
    # name: hidden, depth, heads, mlp
    "tiny": dict(hidden_dim=192, depth=4, num_heads=3, mlp_dim=512),
    "small": dict(hidden_dim=384, depth=12, num_heads=6, mlp_dim=1536),
    "base": dict(hidden_dim=768, depth=12, num_heads=12, mlp_dim=3072),
    "large": dict(hidden_dim=1024, depth=24, num_heads=16, mlp_dim=4096),
}


def vit_config(preset: str = "base", **overrides: Any) -> ViTConfig:
    if preset not in _PRESETS:
        raise ValueError(f"unknown ViT preset {preset!r}; have {sorted(_PRESETS)}")
    kw: dict[str, Any] = dict(_PRESETS[preset])
    kw.update(overrides)
    return ViTConfig(**kw)


def vit_forward_flops(cfg: ViTConfig, batch_size: int, *, with_head: bool = True) -> float:
    """Analytic matmul FLOPs of one forward pass (2 FLOPs per MAC).

    XLA's ``compiled.cost_analysis()`` counts the ``nn.scan``'d block body
    ONCE rather than ``depth`` times (the scan is a single while-loop body to
    the cost model), so roofline/MFU math must use this closed form; the
    compiled number validates the per-layer term (see tools/bench_tagger.py).
    """
    d, t = cfg.hidden_dim, cfg.num_patches + 1
    patch = 2 * cfg.num_patches * (cfg.patch_size**2 * 3) * d
    per_layer = (
        2 * t * d * 3 * d  # qkv projection
        + 2 * 2 * t * t * d  # attention logits + weighted sum
        + 2 * t * d * d  # output projection
        + 2 * 2 * t * d * cfg.mlp_dim  # fc1 + fc2
    )
    head = 2 * d * cfg.num_classes if with_head else 0
    return float(batch_size) * (patch + cfg.depth * per_layer + head)


def _flash_attention_padded(q: Array, k: Array, v: Array, scale: float) -> Array:
    """(B, T, H, D) flash attention for arbitrary T via segment-masked padding.

    Pads the token axis to a 128-multiple for the Pallas kernel's block
    grid; padded positions get segment id 0 (real tokens 1), so they only
    attend each other and their garbage rows are sliced off.  Online
    softmax in VMEM — no (T, T) HBM intermediate.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, h, d = q.shape
    pad = (-t) % 128
    tp = t + pad
    qh = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0)))
    kh = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0)))
    vh = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = jnp.concatenate(
        [jnp.ones((b, t), jnp.int32), jnp.zeros((b, pad), jnp.int32)], axis=1
    )
    block = next(c for c in (512, 256, 128) if tp % c == 0)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(
        qh, kh, vh, segment_ids=SegmentIds(seg, seg),
        sm_scale=scale, block_sizes=sizes,
    )
    return out[:, :, :t, :].transpose(0, 2, 1, 3)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        head_dim = cfg.hidden_dim // cfg.num_heads
        qkv = nn.DenseGeneral(
            features=(3, cfg.num_heads, head_dim),
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="qkv",
        )(x)
        # (B, T, H, D) attention with f32 softmax accumulation.
        scale = head_dim**-0.5
        if cfg.attn_impl == "pallas":
            # packed path: the kernel blocks straight into the projection's
            # (B, T, 3, H, D) output — no q/k/v slice copies materialize
            from kobato_eyes_tpu.ops.pallas_attention import (
                head_resident_attention_packed,
            )

            out = head_resident_attention_packed(qkv, scale=scale)
            return nn.DenseGeneral(
                features=cfg.hidden_dim,
                axis=(-2, -1),
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                name="proj",
            )(out)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if cfg.attn_impl == "flash":
            out = _flash_attention_padded(q, k, v, scale)
        elif cfg.attn_impl == "fused":
            # XLA's canonical attention (same math: f32 logits accumulation,
            # f32 softmax); gives the compiler the whole pattern to schedule
            out = jax.nn.dot_product_attention(q, k, v, scale=scale)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            weights = jax.nn.softmax(logits * scale, axis=-1).astype(cfg.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        return nn.DenseGeneral(
            features=cfg.hidden_dim,
            axis=(-2, -1),
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="proj",
        )(out)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)
        x = x + Attention(cfg, name="attn")(ln("ln1")(x))
        h = ln("ln2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(h)
        if cfg.act == "quick_gelu":  # OpenAI CLIP: x * sigmoid(1.702 x)
            h = h * jax.nn.sigmoid(1.702 * h)
        elif cfg.act == "gelu_tanh":
            # perf knob: the exact-erf gelu lowers to a LUT epilogue that
            # drags the fc2 fusion to ~35% MXU efficiency (trace r3);
            # the tanh form stays polynomial (|err| <~ 1e-3 activation)
            h = nn.gelu(h, approximate=True)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2")(h)
        return x + h


class _ScanBlock(nn.Module):
    """Block wrapped for nn.scan (carry = tokens, no per-step inputs)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: Array, _: None) -> tuple[Array, None]:
        block = Block
        if self.cfg.remat:
            block = nn.remat(Block)
        return block(self.cfg, name="block")(x), None


class ViT(nn.Module):
    """ViT image encoder.

    ``__call__`` returns pooled features; ``logits`` adds the classifier head.
    Input is NHWC float (preprocessed; see models/preprocess.py).
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: Array, *, features_only: bool = False) -> Array:
        cfg = self.cfg
        b, h, w, c = images.shape
        p = cfg.patch_size
        if h != cfg.image_size or w != cfg.image_size:
            raise ValueError(f"expected {cfg.image_size}px input, got {h}x{w}")
        x = images.astype(cfg.dtype)
        # Patch embedding as a single big matmul: (B, T, p*p*c) @ (p*p*c, D).
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, cfg.num_patches, p * p * c)
        x = nn.Dense(
            cfg.hidden_dim, use_bias=cfg.patch_bias,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="patch_embed",
        )(x)

        cls = self.param("cls", nn.initializers.zeros, (1, 1, cfg.hidden_dim), cfg.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.hidden_dim)), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.num_patches + 1, cfg.hidden_dim),
            cfg.param_dtype,
        )
        x = x + pos.astype(cfg.dtype)
        if cfg.ln_pre:
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_pre"
            )(x)

        scan = nn.scan(
            _ScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.depth,
            unroll=max(1, cfg.unroll),
        )
        x, _ = scan(cfg, name="blocks")(x, None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_final")(x)
        if cfg.pool == "cls":
            feat = x[:, 0]
        else:
            feat = jnp.mean(x[:, 1:], axis=1)
        if features_only:
            return feat
        head = nn.Dense(
            cfg.num_classes, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head"
        )
        return head(feat).astype(jnp.float32)


def init_params(cfg: ViTConfig, seed: int = 0) -> Any:
    """Initialize parameters with a tiny dummy batch (shapes only)."""
    model = ViT(cfg)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]
