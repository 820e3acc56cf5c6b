"""Mesh construction and sharding-rule edge cases (CPU virtual mesh)."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.parallel.mesh import make_mesh, place_params, shard_batch


def test_make_mesh_validates_divisibility():
    with pytest.raises(ValueError, match="must divide"):
        make_mesh(data=1, model=3)  # 3 does not divide 8
    with pytest.raises(ValueError, match="devices"):
        make_mesh(data=3, model=2)  # 6 != 8
    mesh = make_mesh(data=-1, model=2)  # -1 = all remaining
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_place_params_falls_back_to_replication_on_indivisible_dims():
    """A param whose sharded dim does not divide the mesh axis must be
    replicated, not crash — importer trees carry odd head counts."""
    import jax

    mesh = make_mesh(data=4, model=2)
    params = {
        "fc1": {"kernel": np.zeros((16, 6), np.float32)},  # 6 % 2 == 0 -> shard
        "odd": {"kernel": np.zeros((16, 5), np.float32)},  # 5 % 2 != 0 -> replicate
    }
    placed = place_params(params, mesh)
    shard_odd = placed["odd"]["kernel"].sharding
    assert shard_odd.is_fully_replicated
    batch = jax.device_put(np.zeros((8, 3), np.float32), shard_batch(mesh))
    assert not batch.sharding.is_fully_replicated
