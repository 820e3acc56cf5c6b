"""Recorded checkpoint manifests vs the importers (offline real-weight proxy).

Real checkpoints are unreachable in this environment, so the production
targets are pinned as recorded key->shape manifests
(tests/models/fixtures/*.manifest.json):

* ``wd-v1-4-swinv2-tagger-v2`` class: SwinV2-Base @448/patch4, 9083 labels
  (timm ``SwinTransformerV2`` naming; reference loads the ONNX export of this
  model, ``src/tagger/wd14_onnx.py:139-202``; label table size
  ``src/tagger/model_inspection.py:13-15`` is the PixAI 13461 analog).
* OpenAI CLIP ViT-B/32 visual tower (open_clip naming; the reference's
  declared ANN model, ``pyproject.toml:50-52``).

The tests round-trip: manifest -> synthetic state dict -> importer -> flax
param tree whose shapes must equal the model's own init, and assert drifted
naming/shapes are rejected with named keys.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kobato_eyes_tpu.models.import_weights import (
    StateDictMismatch,
    clip_vit_params_from_torch_state,
    clip_vit_state_manifest,
    swin_params_from_torch_state,
    swin_state_manifest,
    validate_state_against_manifest,
)
from kobato_eyes_tpu.models.swin import SwinV2, swin_config
from kobato_eyes_tpu.models.vit import vit_config

FIXTURES = Path(__file__).parent / "fixtures"

WD14_SWIN_CFG = swin_config(
    "base", image_size=448, patch_size=4, window_size=14, num_classes=9083
)
CLIP_B32_CFG = vit_config(
    "base", image_size=224, patch_size=32, hidden_dim=768,
    num_heads=12, mlp_dim=3072, depth=12, num_classes=0,
)


def _load(name: str) -> dict[str, tuple[int, ...]]:
    with open(FIXTURES / name) as fh:
        return {k: tuple(v) for k, v in json.load(fh).items()}


def _state_from_manifest(manifest, seed=0):
    rng = np.random.default_rng(seed)
    return {
        k: rng.normal(scale=0.02, size=shape).astype(np.float32)
        for k, shape in manifest.items()
    }


def _shapes(tree) -> dict[str, tuple[int, ...]]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(kp): tuple(np.shape(v)) for kp, v in flat}


def test_recorded_manifests_match_generators():
    """The checked-in fixtures ARE the generator output for the pinned
    configs — drift in either direction fails."""
    swin = {k: tuple(v) for k, v in swin_state_manifest(WD14_SWIN_CFG).items()}
    assert swin == _load("wd_v1_4_swinv2_tagger_v2.manifest.json")
    clip = {k: tuple(v) for k, v in clip_vit_state_manifest(CLIP_B32_CFG, embed_out=512).items()}
    assert clip == _load("clip_vit_b32_openai.manifest.json")


def test_manifest_param_counts_match_known_models():
    """~88M-parameter architectures: SwinV2-B backbone and CLIP ViT-B/32."""
    swin = _load("wd_v1_4_swinv2_tagger_v2.manifest.json")
    head = sum(
        int(np.prod(s)) for k, s in swin.items() if k.startswith("head.")
    )
    backbone = sum(int(np.prod(s)) for s in swin.values()) - head
    assert 86e6 < backbone < 90e6
    assert head == 9083 * 1024 + 9083
    clip = _load("clip_vit_b32_openai.manifest.json")
    total = sum(int(np.prod(s)) for s in clip.values())
    assert 87e6 < total < 89e6


@pytest.mark.slow
def test_swin_manifest_roundtrips_through_importer():
    """manifest state dict -> importer -> tree with exactly the flax model's
    init shapes (eval_shape: no math, just the contract)."""
    manifest = _load("wd_v1_4_swinv2_tagger_v2.manifest.json")
    state = _state_from_manifest(manifest)
    validate_state_against_manifest(state, manifest, name="wd14-swinv2")
    params = swin_params_from_torch_state(state, WD14_SWIN_CFG)

    model = SwinV2(WD14_SWIN_CFG)
    x = jnp.zeros((1, 448, 448, 3), jnp.float32)
    want = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)["params"]
    assert _shapes(params) == _shapes(want)


@pytest.mark.slow
def test_clip_manifest_roundtrips_through_importer():
    from kobato_eyes_tpu.index.embedder import ClipImageEncoder

    manifest = _load("clip_vit_b32_openai.manifest.json")
    state = _state_from_manifest(manifest)
    validate_state_against_manifest(state, manifest, name="clip-vit-b32")
    cfg = vit_config(
        "base", image_size=224, patch_size=32, hidden_dim=768,
        num_heads=12, mlp_dim=3072, depth=12, num_classes=0,
        ln_pre=True, patch_bias=False, act="quick_gelu",
    )
    params = clip_vit_params_from_torch_state(state, cfg)
    model = ClipImageEncoder(cfg, embed_dim=512)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    want = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)["params"]
    assert _shapes(params) == _shapes(want)


def test_drifted_key_rejected_with_name():
    manifest = {k: tuple(v) for k, v in swin_state_manifest(
        swin_config("tiny", image_size=64, patch_size=4, window_size=2, num_classes=5)
    ).items()}
    state = _state_from_manifest(manifest)
    # simulate a timm rename: qkv.weight -> qkv.linear.weight
    val = state.pop("layers.0.blocks.0.attn.qkv.weight")
    state["layers.0.blocks.0.attn.qkv.linear.weight"] = val
    with pytest.raises(StateDictMismatch) as ei:
        validate_state_against_manifest(state, manifest, name="drifted")
    msg = str(ei.value)
    assert "missing" in msg and "layers.0.blocks.0.attn.qkv.weight" in msg
    assert "unexpected" in msg and "qkv.linear.weight" in msg


def test_wrong_shape_rejected_with_both_shapes():
    manifest = {k: tuple(v) for k, v in clip_vit_state_manifest(
        vit_config("tiny", image_size=32, patch_size=16, num_classes=0),
        embed_out=8,
    ).items()}
    state = _state_from_manifest(manifest)
    state["visual.proj"] = np.zeros((3, 3), np.float32)
    with pytest.raises(StateDictMismatch) as ei:
        validate_state_against_manifest(state, manifest)
    assert "visual.proj" in str(ei.value) and "(3, 3)" in str(ei.value)


def test_import_torch_checkpoint_strict_validates_vit(tmp_path):
    """strict=True covers the ViT branch too: drifted timm naming fails with
    the offending key named, not a deep KeyError mid-conversion."""
    torch = pytest.importorskip("torch")
    from kobato_eyes_tpu.models.import_weights import (
        import_torch_checkpoint,
        vit_state_manifest,
    )

    cfg = vit_config("tiny", image_size=32, patch_size=16, num_classes=5)
    manifest = {k: tuple(v) for k, v in vit_state_manifest(cfg).items()}
    state = {
        k: torch.from_numpy(v) for k, v in _state_from_manifest(manifest).items()
    }
    p = tmp_path / "vit.pt"
    torch.save(state, p)
    params = import_torch_checkpoint(str(p), cfg)  # strict default passes
    assert "head" in params

    bad = dict(state)
    bad["blocks.0.attn.qkv.linear.weight"] = bad.pop("blocks.0.attn.qkv.weight")
    torch.save(bad, p)
    with pytest.raises(StateDictMismatch) as ei:
        import_torch_checkpoint(str(p), cfg)
    assert "blocks.0.attn.qkv.weight" in str(ei.value)


def test_import_torch_checkpoint_dispatches_and_validates_clip(tmp_path):
    """A CLIP visual tower routes to the CLIP importer (with its manifest
    validated) instead of crashing in the timm-naming converter."""
    torch = pytest.importorskip("torch")
    from kobato_eyes_tpu.models.import_weights import import_torch_checkpoint

    cfg = vit_config(
        "tiny", image_size=32, patch_size=16, num_classes=0,
        ln_pre=True, patch_bias=False, act="quick_gelu",
    )
    manifest = {
        k: tuple(v)
        for k, v in clip_vit_state_manifest(cfg, embed_out=8).items()
    }
    state = {
        k: torch.from_numpy(v) for k, v in _state_from_manifest(manifest).items()
    }
    p = tmp_path / "clip.pt"
    torch.save(state, p)
    params = import_torch_checkpoint(str(p), cfg)
    assert set(params) == {"vit", "proj"}

    bad = dict(state)
    bad["visual.conv1.bias"] = torch.zeros(cfg.hidden_dim)  # CLIP has no conv bias
    torch.save(bad, p)
    with pytest.raises(StateDictMismatch) as ei:
        import_torch_checkpoint(str(p), cfg)
    assert "conv1.bias" in str(ei.value)


def test_derived_buffers_are_not_unexpected():
    cfg = swin_config("tiny", image_size=64, patch_size=4, window_size=2, num_classes=5)
    manifest = {k: tuple(v) for k, v in swin_state_manifest(cfg).items()}
    state = _state_from_manifest(manifest)
    state["layers.0.blocks.0.attn.relative_coords_table"] = np.zeros((1, 5, 5, 2))
    state["layers.0.blocks.0.attn.relative_position_index"] = np.zeros((9, 9))
    state["layers.0.blocks.1.attn_mask"] = np.zeros((4, 9, 9))
    state["layers.0.blocks.0.attn.k_bias"] = np.zeros((96,))
    validate_state_against_manifest(state, manifest)  # no raise
