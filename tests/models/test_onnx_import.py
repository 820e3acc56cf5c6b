"""Dependency-free ONNX reader: wire-format parsing + importer integration.

The reference ships its taggers as .onnx files (wd14_onnx.py:139-202), so
the importer must consume them directly.  These tests cover the protobuf
parser (round-trip through our writer, cross-validation against protoc's
canonical encoder when available, bfloat16/typed-data/external-data edge
cases) and the end-to-end path: torch module -> ONNX bytes ->
import_torch_checkpoint -> flax forward parity.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pytest

from kobato_eyes_tpu.models.import_weights import clip_vit_state_manifest
from kobato_eyes_tpu.models.onnx_import import (
    OnnxParseError,
    _len_field,
    _tag,
    _varint,
    read_onnx_initializers,
    write_onnx_initializers,
)

_WIRE_VARINT, _WIRE_LEN = 0, 2


def test_roundtrip_dtypes_and_shapes(tmp_path):
    rng = np.random.default_rng(0)
    state = {
        "w.f32": rng.normal(size=(3, 4, 5)).astype(np.float32),
        "w.f16": rng.normal(size=(8,)).astype(np.float16),
        "w.f64": rng.normal(size=(2, 2)).astype(np.float64),
        "w.i64": rng.integers(-5, 5, size=(7,)).astype(np.int64),
        "w.i32": rng.integers(-5, 5, size=(2, 3)).astype(np.int32),
        "w.u8": rng.integers(0, 255, size=(6,)).astype(np.uint8),
        "w.bool": np.array([True, False, True]),
        "w.scalar": np.float32(3.5).reshape(()),
    }
    p = tmp_path / "weights.onnx"
    write_onnx_initializers(p, state)
    got = read_onnx_initializers(p)
    assert set(got) == set(state)
    for k, v in state.items():
        assert got[k].dtype == v.dtype, k
        np.testing.assert_array_equal(got[k], v)


_MINI_PROTO = """
syntax = "proto3";
message TensorProto {
  repeated int64 dims = 1;
  int32 data_type = 2;
  repeated float float_data = 4;
  repeated int32 int32_data = 5;
  repeated int64 int64_data = 7;
  string name = 8;
  bytes raw_data = 9;
  repeated double double_data = 10;
}
message GraphProto {
  string name = 2;
  repeated TensorProto initializer = 5;
}
message OperatorSetIdProto {
  string domain = 1;
  int64 version = 2;
}
message ModelProto {
  int64 ir_version = 1;
  string producer_name = 2;
  GraphProto graph = 7;
  repeated OperatorSetIdProto opset_import = 8;
}
"""

_MINI_TEXT = """
ir_version: 8
producer_name: "parity-test"
graph {
  name: "g"
  initializer {
    dims: 2
    dims: 2
    data_type: 1
    float_data: 1.5
    float_data: -2.0
    float_data: 0.25
    float_data: 4.0
    name: "typed.f32"
  }
  initializer {
    dims: 3
    data_type: 7
    int64_data: -1
    int64_data: 0
    int64_data: 7
    name: "typed.i64"
  }
  initializer {
    dims: 2
    data_type: 1
    raw_data: "\\000\\000\\200\\077\\000\\000\\000\\300"
    name: "raw.f32"
  }
}
opset_import { version: 17 }
"""


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc not available")
def test_parser_against_protoc_canonical_encoding(tmp_path):
    """The reader must accept bytes produced by protobuf's own encoder, not
    just our writer — protoc --encode is the independent oracle, including
    the typed float_data/int64_data storage our writer never emits."""
    (tmp_path / "onnx_mini.proto").write_text(_MINI_PROTO)
    enc = subprocess.run(
        ["protoc", f"--proto_path={tmp_path}", "--encode=ModelProto", "onnx_mini.proto"],
        input=_MINI_TEXT.encode(), capture_output=True, check=True,
    )
    p = tmp_path / "canonical.onnx"
    p.write_bytes(enc.stdout)
    got = read_onnx_initializers(p)
    np.testing.assert_array_equal(
        got["typed.f32"], np.array([[1.5, -2.0], [0.25, 4.0]], np.float32)
    )
    assert got["typed.f32"].dtype == np.float32
    np.testing.assert_array_equal(got["typed.i64"], np.array([-1, 0, 7], np.int64))
    np.testing.assert_array_equal(got["raw.f32"], np.array([1.0, -2.0], np.float32))


def _model_with_tensor(tensor_fields: bytes) -> bytes:
    graph = _len_field(5, tensor_fields)
    return _len_field(7, graph)


def test_bfloat16_raw_data(tmp_path):
    # bf16 = high 16 bits of f32: 1.0 -> 0x3F80, -2.5 -> 0xC020
    t = (
        _tag(1, _WIRE_VARINT) + _varint(2)
        + _tag(2, _WIRE_VARINT) + _varint(16)  # BFLOAT16
        + _len_field(8, b"w.bf16")
        + _len_field(9, np.array([0x3F80, 0xC020], np.uint16).tobytes())
    )
    p = tmp_path / "bf16.onnx"
    p.write_bytes(_model_with_tensor(bytes(t)))
    got = read_onnx_initializers(p)
    np.testing.assert_array_equal(got["w.bf16"], np.array([1.0, -2.5], np.float32))


def test_external_data_rejected_with_message(tmp_path):
    t = (
        _tag(1, _WIRE_VARINT) + _varint(1)
        + _tag(2, _WIRE_VARINT) + _varint(1)
        + _len_field(8, b"w.ext")
        + _tag(14, _WIRE_VARINT) + _varint(1)  # data_location = EXTERNAL
    )
    p = tmp_path / "ext.onnx"
    p.write_bytes(_model_with_tensor(bytes(t)))
    with pytest.raises(OnnxParseError, match="w.ext.*external"):
        read_onnx_initializers(p)


def test_not_a_model_rejected(tmp_path):
    p = tmp_path / "junk.onnx"
    p.write_bytes(b"\x00\x01\x02definitely not protobuf")
    with pytest.raises(OnnxParseError):
        read_onnx_initializers(p)


def test_import_torch_checkpoint_consumes_onnx(tmp_path):
    """End to end: torch ViT state -> ONNX file -> strict import -> flax
    forward parity (same tolerance as the torch-state golden test)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from kobato_eyes_tpu.models.import_weights import (
        StateDictMismatch,
        import_torch_checkpoint,
    )
    from kobato_eyes_tpu.models.vit import ViT, vit_config
    from tests.models.test_import_weights import TorchViT

    torch.manual_seed(0)
    tm = TorchViT()
    tm.eval()
    cfg = vit_config(
        "tiny", image_size=32, patch_size=16, hidden_dim=64, depth=2,
        num_heads=4, mlp_dim=128, num_classes=10, dtype=jnp.float32,
    )
    state_np = {k: v.numpy() for k, v in tm.state_dict().items()}
    p = tmp_path / "vit.onnx"
    write_onnx_initializers(p, state_np)
    params = import_torch_checkpoint(str(p), cfg)  # strict by default

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ViT(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # drifted initializer naming fails with the key named, like torch paths
    bad = dict(state_np)
    bad["blocks.0.attn.qkv.linear.weight"] = bad.pop("blocks.0.attn.qkv.weight")
    write_onnx_initializers(p, bad)
    with pytest.raises(StateDictMismatch) as ei:
        import_torch_checkpoint(str(p), cfg)
    assert "blocks.0.attn.qkv.weight" in str(ei.value)


def test_import_recovers_constant_folded_initializers(tmp_path):
    """Real torch.onnx exports with constant folding rename Linear weights to
    ``onnx::MatMul_<n>`` and store them TRANSPOSED (biases keep their names).
    The importer recovers them by shape signature + graph-order pairing and
    the recovered params stay forward-parity with the unfolded import."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from kobato_eyes_tpu.models.import_weights import (
        StateDictMismatch,
        import_torch_checkpoint,
    )
    from kobato_eyes_tpu.models.vit import ViT, vit_config
    from tests.models.test_import_weights import TorchViT

    torch.manual_seed(3)
    tm = TorchViT()
    tm.eval()
    cfg = vit_config(
        "tiny", image_size=32, patch_size=16, hidden_dim=64, depth=2,
        num_heads=4, mlp_dim=128, num_classes=10, dtype=jnp.float32,
    )
    state_np = {k: v.numpy() for k, v in tm.state_dict().items()}

    # fold every 2-D Linear weight the way the exporter does: transposed,
    # renamed to onnx::MatMul_<counter> in module (graph) order; the counter
    # is deliberately non-contiguous like real exports
    folded = {}
    counter = 37
    for k, v in state_np.items():
        if k.endswith("weight") and v.ndim == 2:
            folded[f"onnx::MatMul_{counter}"] = np.ascontiguousarray(v.T)
            counter += 13
        else:
            folded[k] = v
    p = tmp_path / "vit_folded.onnx"
    write_onnx_initializers(p, folded)
    params = import_torch_checkpoint(str(p), cfg)  # strict + recovery

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ViT(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # an AMBIGUOUS fold (group sizes differ: one of two same-shape weights
    # missing) must refuse to guess and still fail with the keys named
    bad = dict(folded)
    removed = next(k for k in bad if k.startswith("onnx::MatMul_"))
    del bad[removed]
    write_onnx_initializers(p, bad)
    with pytest.raises(StateDictMismatch):
        import_torch_checkpoint(str(p), cfg)


def test_import_torch_checkpoint_consumes_swin_onnx(tmp_path):
    """The SwinV2 branch works through ONNX too, including the derived
    buffers (CPB tables, masks, k_bias) a torch export carries."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from kobato_eyes_tpu.models.import_weights import import_torch_checkpoint
    from kobato_eyes_tpu.models.swin import SwinConfig, SwinV2
    from tests.models.test_import_weights import TorchSwinV2

    torch.manual_seed(1)
    tm = TorchSwinV2()
    tm.eval()
    cfg = SwinConfig(
        image_size=16, patch_size=2, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=2, mlp_ratio=2.0, num_classes=11,
        dtype=jnp.float32,
    )
    state_np = {k: v.numpy() for k, v in tm.state_dict().items()}
    p = tmp_path / "swin.onnx"
    write_onnx_initializers(p, state_np)
    params = import_torch_checkpoint(str(p), cfg)

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(SwinV2(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_embedder_from_clip_onnx(tmp_path):
    """ImageEmbedder.from_clip_checkpoint consumes ONNX CLIP towers through
    the same strict importer as torch state dicts."""
    import jax.numpy as jnp

    from kobato_eyes_tpu.index.embedder import ImageEmbedder
    from kobato_eyes_tpu.models.vit import vit_config

    cfg = vit_config(
        "tiny", image_size=32, patch_size=16, num_classes=8,
        ln_pre=True, patch_bias=False, act="quick_gelu",
    )
    manifest = {
        k: tuple(v)
        for k, v in clip_vit_state_manifest(cfg, embed_out=8).items()
    }
    rng = np.random.default_rng(0)
    state = {
        k: rng.normal(scale=0.02, size=s).astype(np.float32)
        for k, s in manifest.items()
    }
    p = tmp_path / "clip.onnx"
    write_onnx_initializers(p, state)
    emb = ImageEmbedder.from_clip_checkpoint(
        p, preset="tiny", image_size=32, patch_size=16, embed_dim=8,
    )
    vecs = emb.embed_batch_prepared(
        np.zeros((2, 32, 32, 3), np.uint8)
    )
    assert np.asarray(vecs).shape == (2, 8)
    # embeddings are unit-norm (cosine space)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vecs), axis=1), 1.0, atol=1e-4)


def test_graph_corroboration_fixes_order_swapped_fold(tmp_path):
    """ADVICE r4: if an exporter's topological order diverges from module
    order within a same-shape group, order pairing silently mis-assigns
    weights (names/shapes validate cleanly).  With graph nodes present, the
    MatMul->Add bias-sibling chain corroborates the pairing exactly and must
    override the (wrong) order pairing."""
    from kobato_eyes_tpu.models.onnx_import import (
        read_onnx_nodes,
        remap_folded_initializers,
    )

    rng = np.random.default_rng(0)
    w1 = rng.normal(size=(8, 8)).astype(np.float32)
    w2 = rng.normal(size=(8, 8)).astype(np.float32)
    b1 = rng.normal(size=(8,)).astype(np.float32)
    b2 = rng.normal(size=(8,)).astype(np.float32)
    manifest = {
        "blocks.0.fc.weight": (8, 8), "blocks.0.fc.bias": (8,),
        "blocks.1.fc.weight": (8, 8), "blocks.1.fc.bias": (8,),
    }
    # ADVERSARIAL numbering: the folded counter ORDER-SWAPS the two layers
    # (block 0's weight gets the HIGHER suffix), so order pairing is wrong
    state = {
        "onnx::MatMul_99": np.ascontiguousarray(w1.T),  # belongs to block 0
        "onnx::MatMul_12": np.ascontiguousarray(w2.T),  # belongs to block 1
        "blocks.0.fc.bias": b1,
        "blocks.1.fc.bias": b2,
    }
    nodes = [
        ("MatMul", ("x", "onnx::MatMul_99"), ("mm0_out",)),
        ("Add", ("mm0_out", "blocks.0.fc.bias"), ("a0_out",)),
        ("MatMul", ("a0_out", "onnx::MatMul_12"), ("mm1_out",)),
        ("Add", ("mm1_out", "blocks.1.fc.bias"), ("a1_out",)),
    ]
    p = tmp_path / "swapped.onnx"
    write_onnx_initializers(p, state, nodes=nodes)
    assert read_onnx_nodes(p) == nodes  # writer/reader node round-trip
    assert read_onnx_initializers(p).keys() == state.keys()

    # WITHOUT nodes: order pairing silently swaps the weights (the trap)
    no_nodes, mapping_plain = remap_folded_initializers(state, manifest)
    np.testing.assert_array_equal(no_nodes["blocks.0.fc.weight"], w2)

    # WITH nodes: corroboration assigns each weight to its true layer
    fixed, mapping = remap_folded_initializers(state, manifest, nodes)
    np.testing.assert_array_equal(fixed["blocks.0.fc.weight"], w1)
    np.testing.assert_array_equal(fixed["blocks.1.fc.weight"], w2)
    assert mapping["blocks.0.fc.weight"] == "onnx::MatMul_99"
    assert mapping["blocks.1.fc.weight"] == "onnx::MatMul_12"


def test_uncorroborated_order_match_warns_validate(tmp_path, caplog):
    """Order-matched pairings without graph corroboration must tell the user
    to run `ket validate-checkpoint` (a wrong pairing loads cleanly)."""
    import logging

    from kobato_eyes_tpu.models.onnx_import import remap_folded_initializers

    rng = np.random.default_rng(1)
    manifest = {"a.weight": (4, 4), "b.weight": (4, 4)}
    state = {
        "onnx::MatMul_1": rng.normal(size=(4, 4)).astype(np.float32),
        "onnx::MatMul_2": rng.normal(size=(4, 4)).astype(np.float32),
    }
    with caplog.at_level(logging.WARNING):
        _, mapping = remap_folded_initializers(state, manifest)
    assert len(mapping) == 2
    assert any("validate-checkpoint" in r.message for r in caplog.records)


def test_gemm_bias_corroboration(tmp_path):
    """Gemm folds carry the bias as their own third input."""
    from kobato_eyes_tpu.models.onnx_import import corroborate_folded_weights

    nodes = [
        ("Gemm", ("x", "onnx::MatMul_5", "layer.3.bias"), ("g_out",)),
    ]
    out = corroborate_folded_weights(
        nodes, {"onnx::MatMul_5"}, {"layer.3.bias"}
    )
    assert out == {"onnx::MatMul_5": "layer.3.weight"}
