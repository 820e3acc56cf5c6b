"""Mesh-sharded ANN (flat + IVF) vs single-chip: exact identity incl. ties.

The corpus row-shards over the mesh's data axis; each shard's local top-k
all-gathers and the merge must reproduce ``lax.top_k``'s lowest-index
tie-break exactly (index/flat.py:merged_topk contract).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from kobato_eyes_tpu.index.flat import FlatIndex
from kobato_eyes_tpu.index.ivf import IvfFlatIndex, kmeans, recall_at_k
from kobato_eyes_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=8, model=1)


@pytest.fixture(scope="module")
def corpus(rng_module):
    return rng_module.standard_normal((1000, 64)).astype(np.float32)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(3)


def test_flat_sharded_matches_single(corpus, mesh, rng_module):
    q = rng_module.standard_normal((17, 64)).astype(np.float32)
    single = FlatIndex(corpus)
    sharded = FlatIndex(corpus, mesh=mesh)
    s0, i0 = single.search(q, k=25)
    s1, i1 = sharded.search(q, k=25)
    np.testing.assert_array_equal(i0, i1)
    # the (D,N)-transposed vs row-sharded gemm layouts vectorize differently
    # (backend FMA order), so scores may differ in the last bit; the result
    # IDs above are exact
    np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=0)


def test_flat_sharded_tie_break(mesh):
    # duplicate vectors => exact score ties; the merge must pick the lowest
    # global rows, like single-chip lax.top_k
    base = np.random.default_rng(5).standard_normal((40, 32)).astype(np.float32)
    corpus = np.concatenate([base, base, base])  # every vector x3
    q = base[:4]
    single = FlatIndex(corpus)
    sharded = FlatIndex(corpus, mesh=mesh)
    s0, i0 = single.search(q, k=9)
    s1, i1 = sharded.search(q, k=9)
    np.testing.assert_array_equal(i0, i1)


def test_flat_sharded_small_corpus_padding(mesh):
    # n smaller than the device count: most shards are pure padding
    corpus = np.random.default_rng(9).standard_normal((5, 16)).astype(np.float32)
    q = corpus[:2]
    single = FlatIndex(corpus)
    sharded = FlatIndex(corpus, mesh=mesh)
    s0, i0 = single.search(q, k=5)
    s1, i1 = sharded.search(q, k=5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=0)


def test_ivf_sharded_matches_single(corpus, mesh, rng_module):
    q = rng_module.standard_normal((9, 64)).astype(np.float32)
    # shared quantizer: sharded Lloyd reductions may differ in the last bit,
    # which is a different (equally valid) index — identity is asserted on
    # the SEARCH given the same quantizer
    vecs = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-30)
    quant = kmeans(vecs, 32, iters=5, seed=0)
    single = IvfFlatIndex(corpus, n_clusters=32, quantizer=quant)
    sharded = IvfFlatIndex(corpus, n_clusters=32, quantizer=quant, mesh=mesh)
    for nprobe in (1, 4, 32):
        s0, i0 = single.search(q, k=15, nprobe=nprobe)
        s1, i1 = sharded.search(q, k=15, nprobe=nprobe)
        np.testing.assert_array_equal(i0, i1)
        finite = np.isfinite(s0)
        np.testing.assert_array_equal(finite, np.isfinite(s1))
        np.testing.assert_allclose(s0[finite], s1[finite], rtol=1e-6, atol=0)


def test_ivf_sharded_training_recall(corpus, mesh, rng_module):
    """Fully mesh-trained IVF (sharded Lloyd: XLA inserts the psums) is a
    valid index: recall vs exact matches the single-chip-trained recall."""
    q = rng_module.standard_normal((16, 64)).astype(np.float32)
    exact = FlatIndex(corpus)
    _, truth = exact.search(q, k=10)
    sharded = IvfFlatIndex(corpus, n_clusters=16, mesh=mesh)
    _, got = sharded.search(q, k=10, nprobe=16)  # all lists probed => exact
    assert recall_at_k(got, truth, k=10) == 1.0
