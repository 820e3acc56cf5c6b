"""Dependency-free ONNX checkpoint reader (protobuf wire-format parser).

The reference distributes its taggers as ONNX graphs — ``src/tagger/
wd14_onnx.py:139-202`` loads ``wd-v1-4-*.onnx`` through onnxruntime — so a
user switching from it holds ``.onnx`` files, not torch state dicts.  An
ONNX file is a protobuf ``ModelProto`` whose weights live in
``GraphProto.initializer`` as ``TensorProto`` records.  Neither ``onnx``
nor ``protobuf`` is available in this environment, and neither is needed:
the wire format is simple and stable, and the field numbers used here come
from the public ``onnx.proto`` spec (ModelProto.graph = 7,
GraphProto.initializer = 5, TensorProto.{dims=1, data_type=2, float_data=4,
int32_data=5, int64_data=7, name=8, raw_data=9, double_data=10,
external_data=13, data_location=14}).

``torch.onnx.export`` — the exporter behind the timm SwinV2/ViT release
ONNX files — names parameter initializers with their state-dict keys, so
the extracted mapping feeds the existing importers and their recorded
manifests unchanged (``import_weights.import_torch_checkpoint`` dispatches
here for ``.onnx`` paths).  Real-world exports with constant folding
rename some weight initializers (``onnx::MatMul_<n>`` — a folded Linear,
stored TRANSPOSED) — :func:`remap_folded_initializers` recovers those by
shape signature (exact or transposed) with graph-order pairing inside
same-shape groups; anything it cannot place unambiguously still fails the
strict manifest validation with every offending key named.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, Mapping

import numpy as np

logger = logging.getLogger(__name__)

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5

# TensorProto.DataType -> numpy dtype (bf16 handled specially)
_DTYPES: dict[int, np.dtype] = {
    1: np.dtype(np.float32),
    2: np.dtype(np.uint8),
    3: np.dtype(np.int8),
    4: np.dtype(np.uint16),
    5: np.dtype(np.int16),
    6: np.dtype(np.int32),
    7: np.dtype(np.int64),
    9: np.dtype(np.bool_),
    10: np.dtype(np.float16),
    11: np.dtype(np.float64),
    12: np.dtype(np.uint32),
    13: np.dtype(np.uint64),
}
_BFLOAT16 = 16


class OnnxParseError(ValueError):
    """Malformed or unsupported ONNX protobuf content."""


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise OnnxParseError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise OnnxParseError("varint longer than 10 bytes")


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_number, wire_type, value) over one message's bytes.

    Length-delimited values are yielded as memoryview-free ``bytes`` slices;
    varints as ints; fixed32/64 as raw 4/8-byte slices.
    """
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == _WIRE_VARINT:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        elif wire == _WIRE_LEN:
            n, pos = _read_varint(buf, pos)
            if pos + n > end:
                raise OnnxParseError(f"field {field} overruns buffer")
            yield field, wire, buf[pos : pos + n]
            pos += n
        elif wire == _WIRE_I64:
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == _WIRE_I32:
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        else:
            raise OnnxParseError(f"unsupported wire type {wire} (field {field})")


def _packed_varints(value: object, wire: int) -> list[int]:
    """A repeated varint field arrives packed (one LEN payload) or unpacked."""
    if wire == _WIRE_VARINT:
        return [int(value)]  # type: ignore[arg-type]
    out = []
    buf = bytes(value)  # type: ignore[arg-type]
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def _zigzag_i64(v: int) -> int:
    # TensorProto int64 fields are plain (non-zigzag) varints; negatives
    # arrive as 10-byte two's complement — normalize to signed
    return v - (1 << 64) if v >= (1 << 63) else v


def _tensor_from_proto(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    data_type = 0
    name = ""
    raw: bytes | None = None
    float_data: list[bytes] = []
    double_data: list[bytes] = []
    varint_data: list[int] = []
    int32_varints: list[int] = []
    data_location = 0
    has_external = False
    for field, wire, value in _fields(buf):
        if field == 1:  # dims
            dims.extend(_zigzag_i64(v) for v in _packed_varints(value, wire))
        elif field == 2 and wire == _WIRE_VARINT:
            data_type = int(value)  # type: ignore[arg-type]
        elif field == 4:  # float_data (packed floats or repeated fixed32)
            float_data.append(bytes(value))  # packed LEN payload or one fixed32
        elif field == 5:  # int32_data (also carries f16/bf16/bool/uint8...)
            int32_varints.extend(_packed_varints(value, wire))
        elif field == 7:  # int64_data
            varint_data.extend(_packed_varints(value, wire))
        elif field == 8 and wire == _WIRE_LEN:
            name = bytes(value).decode("utf-8")  # type: ignore[arg-type]
        elif field == 9 and wire == _WIRE_LEN:
            raw = bytes(value)  # type: ignore[arg-type]
        elif field == 10:  # double_data
            double_data.append(bytes(value))  # type: ignore[arg-type]
        elif field == 11:  # uint64_data
            varint_data.extend(_packed_varints(value, wire))
        elif field == 13:
            has_external = True
        elif field == 14 and wire == _WIRE_VARINT:
            data_location = int(value)  # type: ignore[arg-type]
    if has_external or data_location == 1:
        raise OnnxParseError(
            f"initializer {name!r} stores its data externally "
            "(data_location=EXTERNAL); re-export with embedded weights"
        )

    shape = tuple(int(d) for d in dims)
    if data_type == _BFLOAT16:
        if raw is None:
            src = np.asarray(int32_varints, dtype=np.uint32).astype(np.uint16)
        else:
            src = np.frombuffer(raw, dtype=np.uint16)
        arr = (src.astype(np.uint32) << 16).view(np.float32)
        return name, arr.reshape(shape)
    dtype = _DTYPES.get(data_type)
    if dtype is None:
        raise OnnxParseError(f"initializer {name!r}: unsupported data_type {data_type}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data and dtype == np.float32:
        arr = np.frombuffer(b"".join(float_data), dtype=np.float32)
    elif double_data and dtype == np.float64:
        arr = np.frombuffer(b"".join(double_data), dtype=np.float64)
    elif dtype in (np.dtype(np.float16), np.dtype(np.uint16), np.dtype(np.uint8),
                   np.dtype(np.int8), np.dtype(np.int16), np.dtype(np.bool_),
                   np.dtype(np.int32), np.dtype(np.uint32)) and int32_varints:
        # int32_data carries the small integer/half types as widened varints
        wide = np.asarray(
            [_zigzag_i64(v) for v in int32_varints], dtype=np.int64
        )
        if dtype == np.dtype(np.float16):
            arr = wide.astype(np.uint16).view(np.float16)
        else:
            arr = wide.astype(dtype)
    elif varint_data:
        signed = [_zigzag_i64(v) for v in varint_data]
        arr = np.asarray(signed, dtype=np.int64).astype(dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    want = int(np.prod(shape)) if shape else 1
    if arr.size != want:
        raise OnnxParseError(
            f"initializer {name!r}: {arr.size} elements but shape {shape} wants {want}"
        )
    return name, arr.reshape(shape)


def read_onnx_initializers(path: str | Path) -> dict[str, np.ndarray]:
    """Extract ``{initializer_name: array}`` from an ONNX model file.

    Only the weights are read; graph nodes/attributes are skipped wholesale.
    Nested subgraphs (If/Loop bodies) are not descended into — tagger-class
    image models keep all parameters in the top-level graph.
    """
    data = Path(path).read_bytes()
    graph: bytes | None = None
    for field, wire, value in _fields(data):
        if field == 7 and wire == _WIRE_LEN:  # ModelProto.graph
            graph = bytes(value)  # type: ignore[arg-type]
            break
    if graph is None:
        raise OnnxParseError(f"{path}: no GraphProto found — not an ONNX model?")
    out: dict[str, np.ndarray] = {}
    n_anon = 0
    for field, wire, value in _fields(graph):
        if field == 5 and wire == _WIRE_LEN:  # GraphProto.initializer
            name, arr = _tensor_from_proto(bytes(value))  # type: ignore[arg-type]
            if not name:
                n_anon += 1
                name = f"__anonymous_{n_anon}"
            out[name] = arr
    if not out:
        raise OnnxParseError(f"{path}: graph has no initializers (weights)")
    logger.info(
        "onnx: %s -> %d initializers, %.1fM params",
        path, len(out), sum(a.size for a in out.values()) / 1e6,
    )
    return out


# ---------------------------------------------------------------------------
# Folded-initializer recovery
# ---------------------------------------------------------------------------


_FOLDED_PREFIXES = ("onnx::", "Constant_", "_v_", "ortshared_")


def _natural_key(name: str) -> tuple:
    """Sort key that orders blocks.2 before blocks.10 (layer order)."""
    import re

    return tuple(
        int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)
    )


def _graph_order_key(name: str) -> tuple:
    """Exporter-assigned folded names carry a topological counter suffix."""
    import re

    m = re.search(r"(\d+)$", name)
    return (int(m.group(1)) if m else 0, name)


def remap_folded_initializers(
    state: Mapping[str, np.ndarray],
    manifest: Mapping[str, tuple],
) -> tuple[dict[str, np.ndarray], dict[str, str]]:
    """Recover manifest keys from constant-folded initializer names.

    ``torch.onnx.export`` with default constant folding replaces a Linear
    weight consumed by MatMul with an anonymous ``onnx::MatMul_<n>``
    initializer holding the TRANSPOSED matrix (biases keep their names).
    Recovery is two-tier, and deliberately refuses to guess:

    - **unique shape**: a missing manifest key whose expected shape (or its
      2-D transpose) matches exactly one folded candidate, and no other
      missing key wants that shape.
    - **order-matched group**: when k missing keys and k folded candidates
      share one shape signature, pair them layer-order (natural sort of the
      manifest names) against graph order (the folded names' numeric
      suffix) — torch exports parameters in module order, so the orders
      coincide. Groups of unequal size are left unmapped.

    Returns ``(new_state, mapping)`` where mapping is
    ``{manifest_key: folded_name}``; transposed matches are transposed
    back.  Unmappable keys simply stay missing — the caller's strict
    manifest validation then names them.
    """
    missing = [k for k in manifest if k not in state]
    folded = {
        k: v for k, v in state.items()
        if k not in manifest
        and (k.startswith(_FOLDED_PREFIXES) or k.startswith("__anonymous_"))
    }
    if not missing or not folded:
        return dict(state), {}

    def sig(shape: tuple) -> tuple:
        return tuple(int(d) for d in shape)

    want_by_sig: dict[tuple, list[str]] = {}
    for k in missing:
        want_by_sig.setdefault(sig(tuple(manifest[k])), []).append(k)
    # candidates keyed by their EFFECTIVE (state-dict-layout) shape:
    # onnx::MatMul_* 2-D initializers are always the exporter's W^T, so they
    # register transposed — this is what keeps e.g. fc1 (out,in) from pairing
    # with fc2^T, whose on-disk shape happens to equal fc1's expected one
    have_by_sig: dict[tuple, list[tuple[str, bool]]] = {}
    for k, v in folded.items():
        t = k.startswith("onnx::MatMul") and v.ndim == 2
        have_by_sig.setdefault(
            sig(v.T.shape if t else v.shape), []
        ).append((k, t))

    out = dict(state)
    mapping: dict[str, str] = {}
    for want_sig, keys in want_by_sig.items():
        cands = have_by_sig.get(want_sig)
        if cands is None or len(cands) != len(keys):
            continue  # ambiguous or absent: leave for strict validation
        keys_sorted = sorted(keys, key=_natural_key)
        cands_sorted = sorted(cands, key=lambda c: _graph_order_key(c[0]))
        for mk, (fk, transpose) in zip(keys_sorted, cands_sorted):
            arr = folded[fk]
            out[mk] = arr.T if transpose else arr
            out.pop(fk, None)
            mapping[mk] = fk
    if mapping:
        logger.warning(
            "onnx: recovered %d constant-folded initializers by shape/order "
            "(e.g. %s <- %s); verify tag parity before trusting the import",
            len(mapping), *next(iter(mapping.items())),
        )
    return out, mapping


# ---------------------------------------------------------------------------
# Writer — fixture helper (round-trip tests; weight-interchange scratch)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _WIRE_LEN) + _varint(len(payload)) + payload


_NP_TO_ONNX = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.uint16): 4,
    np.dtype(np.int16): 5,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
    np.dtype(np.uint32): 12,
    np.dtype(np.uint64): 13,
}


def write_onnx_initializers(
    path: str | Path, state: Mapping[str, np.ndarray], *, graph_name: str = "weights"
) -> None:
    """Serialize ``state`` as a minimal valid ONNX ``ModelProto``.

    The graph carries initializers only (no nodes) — enough for weight
    interchange and for round-trip tests of the reader against real
    protobuf encoders.  raw_data little-endian, like every exporter.
    """
    inits = []
    for name, arr in state.items():
        a = np.ascontiguousarray(arr)
        if a.dtype not in _NP_TO_ONNX:
            raise ValueError(f"{name}: dtype {a.dtype} not representable in ONNX")
        t = bytearray()
        for d in a.shape:
            t += _tag(1, _WIRE_VARINT) + _varint(int(d))
        t += _tag(2, _WIRE_VARINT) + _varint(_NP_TO_ONNX[a.dtype])
        t += _len_field(8, name.encode("utf-8"))
        t += _len_field(9, a.astype(a.dtype.newbyteorder("<")).tobytes())
        inits.append(_len_field(5, bytes(t)))  # GraphProto.initializer
    graph = _len_field(2, graph_name.encode("utf-8")) + b"".join(inits)
    opset = _tag(2, _WIRE_VARINT) + _varint(17)  # OperatorSetIdProto.version
    model = (
        _tag(1, _WIRE_VARINT) + _varint(8)  # ModelProto.ir_version
        + _len_field(7, graph)  # ModelProto.graph
        + _len_field(8, opset)  # ModelProto.opset_import
    )
    Path(path).write_bytes(model)
