"""Import pretrained tagger weights into the JAX models.

The reference consumes ONNX black boxes; this engine runs native JAX
forwards, so real deployments import weights once (timm/torch state dicts —
the format WD14-family taggers are distributed in alongside their ONNX
exports) and save an orbax checkpoint (``models/tagger.py:save_checkpoint``).

Covers the ViT family (timm ``vit_*`` naming) and the SwinV2 family (timm
``swinv2_*`` naming — the WD14 tagger's actual architecture,
reference ``src/tagger/wd14_onnx.py:106``). The mapping is pure array
reshaping — no torch ops — so the input can be a real ``torch.load`` state
dict or any mapping of numpy arrays with the same keys.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping, Sequence

import numpy as np

from kobato_eyes_tpu.models.swin import SwinConfig
from kobato_eyes_tpu.models.vit import ViTConfig

logger = logging.getLogger(__name__)


def _np(x: Any) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (no torch import needed)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def vit_params_from_torch_state(
    state: Mapping[str, Any], cfg: ViTConfig
) -> dict:
    """timm-style ViT state dict -> flax param tree for models/vit.ViT.

    Expected keys (timm ``VisionTransformer``):
      patch_embed.proj.{weight,bias}, cls_token, pos_embed,
      blocks.N.norm1.{weight,bias}, blocks.N.attn.qkv.{weight,bias},
      blocks.N.attn.proj.{weight,bias}, blocks.N.norm2.{weight,bias},
      blocks.N.mlp.fc1.{weight,bias}, blocks.N.mlp.fc2.{weight,bias},
      norm.{weight,bias}, head.{weight,bias}
    """
    d = cfg.hidden_dim
    heads = cfg.num_heads
    hd = d // heads
    p = cfg.patch_size

    def get(key: str) -> np.ndarray:
        if key not in state:
            raise KeyError(f"missing weight {key!r}")
        return _np(state[key])

    # patch embed: conv (D, C, P, P) -> dense kernel (P*P*C, D) matching our
    # reshape order (rows: (py, px, c))
    w = get("patch_embed.proj.weight")  # (D, C, P, P)
    patch_kernel = w.transpose(2, 3, 1, 0).reshape(p * p * 3, d)
    patch_bias = get("patch_embed.proj.bias")

    cls = get("cls_token").reshape(1, 1, d)
    pos = get("pos_embed")
    want_tokens = cfg.num_patches + 1
    if pos.shape[1] != want_tokens:
        raise ValueError(
            f"pos_embed has {pos.shape[1]} tokens, model expects {want_tokens} "
            f"(interpolation not implemented)"
        )

    # per-layer stacks (our block stack is nn.scan'd: leading depth axis)
    stacks: dict[str, list[np.ndarray]] = {}

    def push(name: str, arr: np.ndarray) -> None:
        stacks.setdefault(name, []).append(arr)

    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        push("ln1/scale", get(pre + "norm1.weight"))
        push("ln1/bias", get(pre + "norm1.bias"))
        qkv_w = get(pre + "attn.qkv.weight")  # (3D, D)
        push("qkv/kernel", qkv_w.T.reshape(d, 3, heads, hd))
        push("qkv/bias", get(pre + "attn.qkv.bias").reshape(3, heads, hd))
        proj_w = get(pre + "attn.proj.weight")  # (D, D) = (out, in)
        push("proj/kernel", proj_w.T.reshape(heads, hd, d))
        push("proj/bias", get(pre + "attn.proj.bias"))
        push("ln2/scale", get(pre + "norm2.weight"))
        push("ln2/bias", get(pre + "norm2.bias"))
        push("fc1/kernel", get(pre + "mlp.fc1.weight").T)
        push("fc1/bias", get(pre + "mlp.fc1.bias"))
        push("fc2/kernel", get(pre + "mlp.fc2.weight").T)
        push("fc2/bias", get(pre + "mlp.fc2.bias"))

    def stacked(name: str) -> np.ndarray:
        return np.stack(stacks[name]).astype(np.float32)

    params: dict = {
        "patch_embed": {"kernel": patch_kernel.astype(np.float32),
                        "bias": patch_bias.astype(np.float32)},
        "cls": cls.astype(np.float32),
        "pos_embed": pos.astype(np.float32),
        "blocks": {
            "block": {
                "attn": {
                    "qkv": {"kernel": stacked("qkv/kernel"), "bias": stacked("qkv/bias")},
                    "proj": {"kernel": stacked("proj/kernel"), "bias": stacked("proj/bias")},
                },
                "ln1": {"scale": stacked("ln1/scale"), "bias": stacked("ln1/bias")},
                "ln2": {"scale": stacked("ln2/scale"), "bias": stacked("ln2/bias")},
                "fc1": {"kernel": stacked("fc1/kernel"), "bias": stacked("fc1/bias")},
                "fc2": {"kernel": stacked("fc2/kernel"), "bias": stacked("fc2/bias")},
            }
        },
        "ln_final": {
            "scale": _np(state["norm.weight"]).astype(np.float32),
            "bias": _np(state["norm.bias"]).astype(np.float32),
        },
    }
    if "head.weight" in state:
        params["head"] = {
            "kernel": _np(state["head.weight"]).T.astype(np.float32),
            "bias": _np(state["head.bias"]).astype(np.float32),
        }
    else:
        logger.warning("state dict has no classifier head; head left random")
    return params


def swin_params_from_torch_state(
    state: Mapping[str, Any], cfg: SwinConfig
) -> dict:
    """timm ``SwinTransformerV2`` state dict -> flax param tree for SwinV2.

    Expected keys (timm naming; ``layers.{s}`` = stage, with the stage-s
    downsample applied at the *start* of stage s+1 in timm — equal to our
    ``merge{s}`` after stage s):

      patch_embed.proj.{weight,bias}, patch_embed.norm.{weight,bias},
      layers.S.blocks.B.attn.{qkv.weight,q_bias,v_bias,logit_scale,
                              cpb_mlp.0.weight,cpb_mlp.0.bias,cpb_mlp.2.weight,
                              proj.weight,proj.bias},
      layers.S.blocks.B.{norm1,norm2}.{weight,bias},
      layers.S.blocks.B.mlp.{fc1,fc2}.{weight,bias},
      layers.S.downsample.{reduction.weight,norm.weight,norm.bias},
      norm.{weight,bias}, head.{weight,bias} (or head.fc.{weight,bias})

    Layout notes (verified by the torch-vs-flax parity test):
      * qkv bias: SwinV2 learns q_bias/v_bias with k fixed at zero.
      * patch merging: timm concatenates (dy,dx) blocks in order
        (0,0),(1,0),(0,1),(1,1); our reshape produces (0,0),(0,1),(1,0),(1,1),
        so the reduction kernel's input chunks are permuted [0,2,1,3].
    """

    def get(key: str) -> np.ndarray:
        if key not in state:
            raise KeyError(f"missing weight {key!r}")
        return _np(state[key])

    def f32(a: np.ndarray) -> np.ndarray:
        return np.asarray(a, dtype=np.float32)

    d0 = cfg.embed_dim
    p = cfg.patch_size
    w = get("patch_embed.proj.weight")  # (D, C, P, P)
    params: dict = {
        "patch_embed": {
            "kernel": f32(w.transpose(2, 3, 1, 0).reshape(p * p * 3, d0)),
            "bias": f32(get("patch_embed.proj.bias")),
        },
        "patch_norm": {
            "scale": f32(get("patch_embed.norm.weight")),
            "bias": f32(get("patch_embed.norm.bias")),
        },
        "norm_final": {
            "scale": f32(get("norm.weight")),
            "bias": f32(get("norm.bias")),
        },
    }

    for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        c = d0 * (2**stage)
        hd = c // heads
        for blk in range(depth):
            pre = f"layers.{stage}.blocks.{blk}."
            qkv_w = get(pre + "attn.qkv.weight")  # (3C, C)
            if pre + "attn.qkv.bias" in state:
                qkv_b = get(pre + "attn.qkv.bias")
            else:
                qkv_b = np.concatenate([
                    get(pre + "attn.q_bias"),
                    np.zeros(c, dtype=np.float32),
                    get(pre + "attn.v_bias"),
                ])
            proj_w = get(pre + "attn.proj.weight")  # (C, C) = (out, in)
            params[f"stage{stage}_block{blk}"] = {
                "attn": {
                    "qkv": {
                        "kernel": f32(qkv_w.T.reshape(c, 3, heads, hd)),
                        "bias": f32(qkv_b.reshape(3, heads, hd)),
                    },
                    "logit_scale": f32(get(pre + "attn.logit_scale")).reshape(heads, 1, 1),
                    "cpb_fc1": {
                        "kernel": f32(get(pre + "attn.cpb_mlp.0.weight").T),
                        "bias": f32(get(pre + "attn.cpb_mlp.0.bias")),
                    },
                    "cpb_fc2": {"kernel": f32(get(pre + "attn.cpb_mlp.2.weight").T)},
                    "proj": {
                        "kernel": f32(proj_w.T.reshape(heads, hd, c)),
                        "bias": f32(get(pre + "attn.proj.bias")),
                    },
                },
                "norm1": {
                    "scale": f32(get(pre + "norm1.weight")),
                    "bias": f32(get(pre + "norm1.bias")),
                },
                "norm2": {
                    "scale": f32(get(pre + "norm2.weight")),
                    "bias": f32(get(pre + "norm2.bias")),
                },
                "fc1": {
                    "kernel": f32(get(pre + "mlp.fc1.weight").T),
                    "bias": f32(get(pre + "mlp.fc1.bias")),
                },
                "fc2": {
                    "kernel": f32(get(pre + "mlp.fc2.weight").T),
                    "bias": f32(get(pre + "mlp.fc2.bias")),
                },
            }
        if stage < cfg.num_stages - 1:
            ds = f"layers.{stage + 1}.downsample."
            red = get(ds + "reduction.weight")  # (2C, 4C), cols = timm block order
            chunks = red.reshape(2 * c, 4, c)
            kernel = chunks[:, (0, 2, 1, 3), :].reshape(2 * c, 4 * c).T  # -> (4C, 2C)
            params[f"merge{stage}"] = {
                "reduction": {"kernel": f32(kernel)},
                "norm": {
                    "scale": f32(get(ds + "norm.weight")),
                    "bias": f32(get(ds + "norm.bias")),
                },
            }

    head_key = "head.weight" if "head.weight" in state else (
        "head.fc.weight" if "head.fc.weight" in state else None
    )
    if head_key is not None:
        bias_key = head_key.replace("weight", "bias")
        params["head"] = {
            "kernel": f32(_np(state[head_key]).T),
            "bias": f32(_np(state[bias_key])),
        }
    else:
        logger.warning("state dict has no classifier head; head left random")
    return params


def clip_vit_params_from_torch_state(
    state: Mapping[str, Any], cfg: ViTConfig
) -> dict:
    """OpenAI/open_clip CLIP *visual tower* state dict -> flax param tree for
    ``index/embedder.ClipImageEncoder`` ({"vit": ..., "proj": ...}).

    Accepts keys with or without the ``visual.`` prefix (a full CLIP state
    dict or an extracted tower).  Expected naming (OpenAI CLIP / open_clip):
      conv1.weight (no bias), class_embedding, positional_embedding,
      ln_pre.{weight,bias},
      transformer.resblocks.N.{ln_1,ln_2}.{weight,bias},
      transformer.resblocks.N.attn.{in_proj_weight,in_proj_bias,
                                     out_proj.weight,out_proj.bias},
      transformer.resblocks.N.mlp.{c_fc,c_proj}.{weight,bias},
      ln_post.{weight,bias}, proj

    cfg must be built with ``ln_pre=True, patch_bias=False`` and
    ``act="quick_gelu"`` for OpenAI checkpoints (open_clip LAION models use
    plain GELU).  The reference's declared ANN model family is exactly this
    tower (``/root/reference/pyproject.toml:50-52``, open_clip_torch).
    """
    d = cfg.hidden_dim
    heads = cfg.num_heads
    hd = d // heads
    p = cfg.patch_size

    prefix = "visual." if any(k.startswith("visual.") for k in state) else ""

    def get(key: str) -> np.ndarray:
        full = prefix + key
        if full not in state:
            raise KeyError(f"missing weight {full!r}")
        return _np(state[full]).astype(np.float32)

    conv = get("conv1.weight")  # (D, 3, P, P), no bias in CLIP
    pos = get("positional_embedding")  # (T, D)
    want_tokens = cfg.num_patches + 1
    if pos.shape[0] != want_tokens:
        raise ValueError(
            f"positional_embedding has {pos.shape[0]} tokens, model expects "
            f"{want_tokens} (interpolation not implemented)"
        )

    stacks: dict[str, list[np.ndarray]] = {}

    def push(name: str, arr: np.ndarray) -> None:
        stacks.setdefault(name, []).append(arr)

    for i in range(cfg.depth):
        pre = f"transformer.resblocks.{i}."
        push("ln1/scale", get(pre + "ln_1.weight"))
        push("ln1/bias", get(pre + "ln_1.bias"))
        push("qkv/kernel", get(pre + "attn.in_proj_weight").T.reshape(d, 3, heads, hd))
        push("qkv/bias", get(pre + "attn.in_proj_bias").reshape(3, heads, hd))
        push("proj/kernel", get(pre + "attn.out_proj.weight").T.reshape(heads, hd, d))
        push("proj/bias", get(pre + "attn.out_proj.bias"))
        push("ln2/scale", get(pre + "ln_2.weight"))
        push("ln2/bias", get(pre + "ln_2.bias"))
        push("fc1/kernel", get(pre + "mlp.c_fc.weight").T)
        push("fc1/bias", get(pre + "mlp.c_fc.bias"))
        push("fc2/kernel", get(pre + "mlp.c_proj.weight").T)
        push("fc2/bias", get(pre + "mlp.c_proj.bias"))

    def stacked(name: str) -> np.ndarray:
        return np.stack(stacks[name]).astype(np.float32)

    vit: dict = {
        "patch_embed": {"kernel": conv.transpose(2, 3, 1, 0).reshape(p * p * 3, d)},
        "cls": get("class_embedding").reshape(1, 1, d),
        "pos_embed": pos[None],
        "ln_pre": {"scale": get("ln_pre.weight"), "bias": get("ln_pre.bias")},
        "blocks": {
            "block": {
                "attn": {
                    "qkv": {"kernel": stacked("qkv/kernel"), "bias": stacked("qkv/bias")},
                    "proj": {"kernel": stacked("proj/kernel"), "bias": stacked("proj/bias")},
                },
                "ln1": {"scale": stacked("ln1/scale"), "bias": stacked("ln1/bias")},
                "ln2": {"scale": stacked("ln2/scale"), "bias": stacked("ln2/bias")},
                "fc1": {"kernel": stacked("fc1/kernel"), "bias": stacked("fc1/bias")},
                "fc2": {"kernel": stacked("fc2/kernel"), "bias": stacked("fc2/bias")},
            }
        },
        "ln_final": {"scale": get("ln_post.weight"), "bias": get("ln_post.bias")},
    }
    return {"vit": vit, "proj": {"kernel": get("proj")}}


# ---------------------------------------------------------------------------
# Checkpoint key/shape manifests
#
# Real checkpoints can't be downloaded in the build environment, so the
# importers are validated against *recorded manifests*: the exact key -> shape
# inventory a real timm/open_clip state dict carries for a given architecture.
# tests/models/fixtures/*.manifest.json pin the two production targets
# (wd-v1-4-swinv2-tagger-v2 class SwinV2-Base@448 and OpenAI CLIP ViT-B/32);
# drift in importer naming against those manifests fails with named keys.
# ---------------------------------------------------------------------------

# Derived (non-learned) entries that appear in some torch state dicts but are
# recomputed from config at load time; never required, never "unexpected".
_DERIVED_KEY_SUFFIXES = (
    "relative_coords_table",
    "relative_position_index",
    "attn_mask",
    "k_bias",  # SwinV2 keeps k bias fixed at zero (buffer in timm)
)


def swin_state_manifest(
    cfg: SwinConfig, *, head_style: str = "fc"
) -> dict[str, tuple[int, ...]]:
    """Expected timm ``SwinTransformerV2`` weight keys -> shapes for ``cfg``.

    Matches timm's module tree (swin_transformer_v2.py): per-stage
    ``layers.{s}``, downsample at the START of stages 1.., SwinV2 q/v biases,
    CPB MLP (512 hidden), and a ``head.fc`` classifier (timm >= 0.9
    ClassifierHead; ``head_style="flat"`` gives the older ``head.weight``).
    Window size affects only derived buffers, which are excluded — the weight
    manifest is window-independent.
    """
    d0, p = cfg.embed_dim, cfg.patch_size
    m: dict[str, tuple[int, ...]] = {
        "patch_embed.proj.weight": (d0, 3, p, p),
        "patch_embed.proj.bias": (d0,),
        "patch_embed.norm.weight": (d0,),
        "patch_embed.norm.bias": (d0,),
    }
    hidden_cpb = 512
    for s, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        c = d0 * (2**s)
        mlp = int(cfg.mlp_ratio * c)
        if s > 0:
            c_in = d0 * (2 ** (s - 1))
            m[f"layers.{s}.downsample.reduction.weight"] = (2 * c_in, 4 * c_in)
            m[f"layers.{s}.downsample.norm.weight"] = (2 * c_in,)
            m[f"layers.{s}.downsample.norm.bias"] = (2 * c_in,)
        for b in range(depth):
            pre = f"layers.{s}.blocks.{b}."
            m[pre + "norm1.weight"] = (c,)
            m[pre + "norm1.bias"] = (c,)
            m[pre + "attn.qkv.weight"] = (3 * c, c)
            m[pre + "attn.q_bias"] = (c,)
            m[pre + "attn.v_bias"] = (c,)
            m[pre + "attn.logit_scale"] = (heads, 1, 1)
            m[pre + "attn.cpb_mlp.0.weight"] = (hidden_cpb, 2)
            m[pre + "attn.cpb_mlp.0.bias"] = (hidden_cpb,)
            m[pre + "attn.cpb_mlp.2.weight"] = (heads, hidden_cpb)
            m[pre + "attn.proj.weight"] = (c, c)
            m[pre + "attn.proj.bias"] = (c,)
            m[pre + "norm2.weight"] = (c,)
            m[pre + "norm2.bias"] = (c,)
            m[pre + "mlp.fc1.weight"] = (mlp, c)
            m[pre + "mlp.fc1.bias"] = (mlp,)
            m[pre + "mlp.fc2.weight"] = (c, mlp)
            m[pre + "mlp.fc2.bias"] = (c,)
    d_final = d0 * (2 ** (cfg.num_stages - 1))
    m["norm.weight"] = (d_final,)
    m["norm.bias"] = (d_final,)
    head = "head.fc" if head_style == "fc" else "head"
    m[f"{head}.weight"] = (cfg.num_classes, d_final)
    m[f"{head}.bias"] = (cfg.num_classes,)
    return m


def vit_state_manifest(
    cfg: ViTConfig, *, head: bool = True
) -> dict[str, tuple[int, ...]]:
    """Expected timm ``VisionTransformer`` weight keys -> shapes for ``cfg``.

    Matches the naming ``vit_params_from_torch_state`` consumes (timm
    vision_transformer.py with a cls token and a flat ``head`` classifier);
    ``head=False`` for headless towers (the importer leaves the head random
    with a warning in that case).
    """
    d, p = cfg.hidden_dim, cfg.patch_size
    m: dict[str, tuple[int, ...]] = {
        "patch_embed.proj.weight": (d, 3, p, p),
        "patch_embed.proj.bias": (d,),
        "cls_token": (1, 1, d),
        "pos_embed": (1, cfg.num_patches + 1, d),
        "norm.weight": (d,),
        "norm.bias": (d,),
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        m[pre + "norm1.weight"] = (d,)
        m[pre + "norm1.bias"] = (d,)
        m[pre + "attn.qkv.weight"] = (3 * d, d)
        m[pre + "attn.qkv.bias"] = (3 * d,)
        m[pre + "attn.proj.weight"] = (d, d)
        m[pre + "attn.proj.bias"] = (d,)
        m[pre + "norm2.weight"] = (d,)
        m[pre + "norm2.bias"] = (d,)
        m[pre + "mlp.fc1.weight"] = (cfg.mlp_dim, d)
        m[pre + "mlp.fc1.bias"] = (cfg.mlp_dim,)
        m[pre + "mlp.fc2.weight"] = (d, cfg.mlp_dim)
        m[pre + "mlp.fc2.bias"] = (d,)
    if head:
        m["head.weight"] = (cfg.num_classes, d)
        m["head.bias"] = (cfg.num_classes,)
    return m


def clip_vit_state_manifest(
    cfg: ViTConfig, *, embed_out: int = 512, prefix: str = "visual."
) -> dict[str, tuple[int, ...]]:
    """Expected OpenAI/open_clip CLIP visual-tower keys -> shapes for ``cfg``."""
    d, p = cfg.hidden_dim, cfg.patch_size
    mlp = cfg.mlp_dim
    tokens = cfg.num_patches + 1
    m: dict[str, tuple[int, ...]] = {
        prefix + "conv1.weight": (d, 3, p, p),
        prefix + "class_embedding": (d,),
        prefix + "positional_embedding": (tokens, d),
        prefix + "ln_pre.weight": (d,),
        prefix + "ln_pre.bias": (d,),
        prefix + "ln_post.weight": (d,),
        prefix + "ln_post.bias": (d,),
        prefix + "proj": (d, embed_out),
    }
    for i in range(cfg.depth):
        pre = f"{prefix}transformer.resblocks.{i}."
        m[pre + "ln_1.weight"] = (d,)
        m[pre + "ln_1.bias"] = (d,)
        m[pre + "attn.in_proj_weight"] = (3 * d, d)
        m[pre + "attn.in_proj_bias"] = (3 * d,)
        m[pre + "attn.out_proj.weight"] = (d, d)
        m[pre + "attn.out_proj.bias"] = (d,)
        m[pre + "ln_2.weight"] = (d,)
        m[pre + "ln_2.bias"] = (d,)
        m[pre + "mlp.c_fc.weight"] = (mlp, d)
        m[pre + "mlp.c_fc.bias"] = (mlp,)
        m[pre + "mlp.c_proj.weight"] = (d, mlp)
        m[pre + "mlp.c_proj.bias"] = (d,)
    return m


class StateDictMismatch(ValueError):
    """Importer/checkpoint naming drift, with the offending keys named."""


def validate_state_against_manifest(
    state: Mapping[str, Any],
    manifest: Mapping[str, Sequence[int]],
    *,
    name: str = "checkpoint",
) -> None:
    """Strict key/shape check of ``state`` vs a recorded manifest.

    Raises :class:`StateDictMismatch` listing every missing key, unexpected
    key (derived buffers excluded), and shape mismatch — so drifted timm /
    open_clip naming is rejected with actionable names instead of a deep
    KeyError mid-conversion.
    """
    missing = [k for k in manifest if k not in state]
    unexpected = [
        k for k in state
        if k not in manifest and not k.endswith(_DERIVED_KEY_SUFFIXES)
    ]
    bad_shapes = []
    for k, want in manifest.items():
        if k in state:
            got = tuple(_np(state[k]).shape)
            if got != tuple(want):
                bad_shapes.append(f"{k}: state {got} != manifest {tuple(want)}")
    if missing or unexpected or bad_shapes:
        parts = []
        if missing:
            parts.append(f"missing keys ({len(missing)}): " + ", ".join(sorted(missing)[:20]))
        if unexpected:
            parts.append(
                f"unexpected keys ({len(unexpected)}): " + ", ".join(sorted(unexpected)[:20])
            )
        if bad_shapes:
            parts.append(f"shape mismatches ({len(bad_shapes)}): " + "; ".join(bad_shapes[:20]))
        raise StateDictMismatch(f"{name} does not match manifest — " + "; ".join(parts))


def import_torch_checkpoint(
    path: str, cfg: ViTConfig | SwinConfig, *, strict: bool = True
) -> dict:
    """Load a .pth/.pt (torch required), .safetensors, or .onnx file and convert.

    ``strict`` validates the state dict against the config's expected
    manifest first, so naming/shape drift fails with every offending key
    named instead of a deep KeyError mid-conversion.
    """
    is_onnx = str(path).endswith(".onnx")
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file  # type: ignore[import-not-found]

        state = load_file(path)
    elif is_onnx:
        # the reference's release format (wd14_onnx.py:139-202); initializer
        # names from torch.onnx.export equal the state-dict keys, so the
        # manifests below validate ONNX files identically
        from kobato_eyes_tpu.models.onnx_import import read_onnx_initializers

        state = read_onnx_initializers(path)
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]

    def check(manifest: Mapping[str, Sequence[int]], st: Mapping[str, Any]):
        """Strict validation; for ONNX, retry once after recovering
        constant-folded initializer names (onnx::MatMul_* etc.) by
        shape/graph-order — then validate the REMAPPED state strictly, so
        an unrecoverable export still fails with every key named."""
        try:
            validate_state_against_manifest(st, manifest, name=str(path))
            return st
        except StateDictMismatch:
            if not is_onnx:
                raise
            from kobato_eyes_tpu.models.onnx_import import (
                read_onnx_nodes,
                remap_folded_initializers,
            )

            try:
                # graph nodes let the bias-sibling chain corroborate folded
                # pairings exactly instead of relying on order alone
                nodes = read_onnx_nodes(path)
            except Exception:
                nodes = None
            st2, mapping = remap_folded_initializers(st, manifest, nodes)
            if not mapping:
                raise
            validate_state_against_manifest(st2, manifest, name=str(path))
            return st2

    if isinstance(cfg, SwinConfig):
        if strict:
            # the bias sibling also votes: a folded export renames the
            # weight (onnx::MatMul_*) but biases keep their names
            style = (
                "fc"
                if "head.fc.weight" in state or "head.fc.bias" in state
                else "flat"
            )
            state = check(swin_state_manifest(cfg, head_style=style), state)
        return swin_params_from_torch_state(state, cfg)
    # ViT: dispatch on the naming family — CLIP visual tower (conv1 /
    # transformer.resblocks) vs timm VisionTransformer (patch_embed / blocks)
    is_clip = any(k.endswith("conv1.weight") or ".resblocks." in k for k in state)
    if is_clip:
        if strict:
            prefix = "visual." if any(k.startswith("visual.") for k in state) else ""
            proj = state.get(prefix + "proj")
            embed_out = int(_np(proj).shape[1]) if proj is not None else 512
            # a full CLIP state dict also carries the text tower; validate
            # the visual keys only (the importer reads only those)
            visual = {
                k: v for k, v in state.items() if not prefix or k.startswith(prefix)
            }
            visual = check(
                clip_vit_state_manifest(cfg, embed_out=embed_out, prefix=prefix),
                visual,
            )
            state = {**state, **visual}
        return clip_vit_params_from_torch_state(state, cfg)
    if strict:
        has_head = "head.weight" in state or "head.bias" in state
        state = check(vit_state_manifest(cfg, head=has_head), state)
    return vit_params_from_torch_state(state, cfg)
