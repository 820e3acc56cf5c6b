"""Mesh-sharded tagger inference on the 8-virtual-device CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest

import jax

from kobato_eyes_tpu.models.labels import synthetic_labels
from kobato_eyes_tpu.models.tagger import WD14Tagger
from kobato_eyes_tpu.models.vit import vit_config
from kobato_eyes_tpu.parallel.mesh import make_mesh, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


def _tagger(mesh=None):
    labels = synthetic_labels(160)
    return WD14Tagger(
        labels=labels,
        # 4 heads so the tensor-parallel axis (model=2) divides evenly
        vit=vit_config("tiny", image_size=64, patch_size=16, num_classes=160, num_heads=4),
        image_size=64, seed=0, mesh=mesh,
    )


def test_sharded_matches_single(rng):
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8) for _ in range(8)]
    single = _tagger()
    mesh = make_mesh(data=4, model=2)
    sharded = _tagger(mesh=mesh)
    batch = single.prepare_batch_from_rgb(imgs)
    # Compare probability vectors: tag *selection* order is unstable between
    # single-chip and tensor-parallel reductions at bf16 (different reduction
    # order over near-equal random-init scores), but the numerics must agree.
    pa = np.asarray(single.forward_probs(batch))
    pb = np.asarray(sharded.forward_probs(batch))
    np.testing.assert_allclose(pa, pb, atol=3e-2)
    # and the sharded path still runs the full selection machinery
    results = sharded.infer_batch(imgs)
    assert len(results) == len(imgs)


def test_sharded_handles_ragged_batch(rng):
    mesh = make_mesh(data=8, model=1)
    tagger = _tagger(mesh=mesh)
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8) for _ in range(5)]
    out = tagger.infer_batch(imgs)  # 5 % 8 != 0 -> padded internally
    assert len(out) == 5


def test_param_sharding_rules_cover_big_tensors():
    mesh = make_mesh(data=4, model=2)
    tagger = _tagger()
    shardings = shard_params(tagger.params, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec for path, s in leaves}
    # the big tensors must be partitioned, not replicated
    assert any("fc1/kernel" in k and "model" in str(v) for k, v in specs.items())
    assert any("head/kernel" in k and "model" in str(v) for k, v in specs.items())
    assert any("qkv/kernel" in k and "model" in str(v) for k, v in specs.items())
