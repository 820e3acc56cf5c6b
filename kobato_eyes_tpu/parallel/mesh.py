"""Device mesh construction and sharding rules for the ViT family.

Axes: ``data`` (batch / file-id shards) x ``model`` (hidden/head/ffn tensor
parallelism).  Parameters are partitioned by path-pattern rules; everything
un-matched is replicated.  With ``model=1`` this degenerates to pure DP.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    *,
    data: int = -1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` = all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model < 1 or n % model != 0:
        raise ValueError(f"model axis {model} must divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# -- parameter partitioning --------------------------------------------------

# Path-pattern -> PartitionSpec for the *last* dims of each param.  Patterns
# match the flattened flax param path (joined with '/').  The nn.scan'd block
# stack adds a leading layer axis, handled by _pad_spec.
_VIT_RULES: tuple[tuple[str, P], ...] = (
    # attention: qkv DenseGeneral kernel (D, 3, heads, head_dim) — shard heads
    (r"attn/qkv/kernel$", P(None, None, MODEL_AXIS, None)),
    (r"attn/qkv/bias$", P(None, MODEL_AXIS, None)),
    # attention out-proj kernel (heads, head_dim, D) — shard heads
    (r"attn/proj/kernel$", P(MODEL_AXIS, None, None)),
    # MLP: fc1 (D, mlp) shard mlp; fc2 (mlp, D) shard mlp
    (r"fc1/kernel$", P(None, MODEL_AXIS)),
    (r"fc1/bias$", P(MODEL_AXIS)),
    (r"fc2/kernel$", P(MODEL_AXIS, None)),
    # classifier head (D, C) — shard the big label axis
    (r"head/kernel$", P(None, MODEL_AXIS)),
    (r"head/bias$", P(MODEL_AXIS)),
)


def _spec_for_path(path: str, ndim: int) -> P:
    for pattern, spec in _VIT_RULES:
        if re.search(pattern, path):
            pad = ndim - len(spec)
            if pad < 0:
                continue
            return P(*([None] * pad), *spec)
    return P()  # replicated


def _path_str(key_path: tuple) -> str:
    parts = []
    for k in key_path:
        name = getattr(k, "key", None)
        parts.append(str(name if name is not None else k))
    return "/".join(parts)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a ViT param tree under ``mesh``.

    A rule only applies when every partitioned dimension is divisible by its
    mesh-axis size; otherwise that tensor is replicated (small models on big
    meshes stay correct, just less parallel).
    """

    def to_sharding(key_path, leaf):
        spec = _spec_for_path(_path_str(key_path), np.ndim(leaf))
        shape = np.shape(leaf)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_params(params: Any, mesh: Mesh) -> Any:
    """Device-put a param tree according to the sharding rules."""
    shardings = shard_params(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
