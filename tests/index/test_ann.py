"""ANN index tests: exact search, IVF recall, HNSW recall + persistence."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.index.flat import FlatIndex
from kobato_eyes_tpu.index.hnsw import HnswIndex
from kobato_eyes_tpu.index.ivf import IvfFlatIndex, kmeans, recall_at_k


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    # clustered data so ANN structures have real structure to exploit
    centers = rng.normal(size=(32, 64)).astype(np.float32)
    assign = rng.integers(0, 32, size=4000)
    vecs = centers[assign] + 0.15 * rng.normal(size=(4000, 64)).astype(np.float32)
    queries = centers[rng.integers(0, 32, size=50)] + 0.15 * rng.normal(size=(50, 64)).astype(
        np.float32
    )
    return vecs.astype(np.float32), queries.astype(np.float32)


def test_flat_exact_matches_numpy(corpus):
    vecs, queries = corpus
    idx = FlatIndex(vecs)
    scores, ids = idx.search(queries, k=10)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ vn.T
    expect = np.argsort(-sims, axis=1)[:, :10]
    # top-1 must agree exactly; top-10 as sets (ties may reorder)
    assert (ids[:, 0] == expect[:, 0]).all()
    for got, want in zip(ids, expect):
        assert len(set(got) & set(want)) >= 9


def test_kmeans_converges(corpus):
    vecs, _ = corpus
    cents, assign = kmeans(vecs, 32, iters=8)
    assert cents.shape == (32, 64)
    assert assign.shape == (len(vecs),)
    # centroids should be unit-norm
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-4)


def test_ivf_recall_beats_floor(corpus):
    vecs, queries = corpus
    exact = FlatIndex(vecs)
    _, exact_ids = exact.search(queries, k=10)
    ivf = IvfFlatIndex(vecs, n_clusters=32, train_iters=8)
    _, ids = ivf.search(queries, k=10, nprobe=8)
    rec = recall_at_k(ids, exact_ids, k=10)
    assert rec >= 0.9, f"ivf recall@10 {rec}"


def test_hnsw_recall_and_roundtrip(corpus, tmp_path):
    vecs, queries = corpus
    exact = FlatIndex(vecs)
    _, exact_ids = exact.search(queries, k=10)

    hnsw = HnswIndex(dim=64, M=16, ef_construction=100)
    hnsw.add(vecs)
    assert len(hnsw) == len(vecs)
    _, ids = hnsw.search(queries, k=10, ef=100)
    rec = recall_at_k(ids, exact_ids, k=10)
    assert rec >= 0.9, f"hnsw recall@10 {rec}"

    path = tmp_path / "graph.hnsw"
    hnsw.save(path)
    loaded = HnswIndex.load(path, dim=64)
    assert len(loaded) == len(vecs)
    _, ids2 = loaded.search(queries, k=10, ef=100)
    assert (ids2 == ids).all()


def test_hnsw_incremental_ids():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(100, 16)).astype(np.float32)
    b = rng.normal(size=(50, 16)).astype(np.float32)
    idx = HnswIndex(dim=16, M=8, ef_construction=50)
    idx.add(a, ids=np.arange(1000, 1100))
    idx.add(b, ids=np.arange(5000, 5050))
    _, ids = idx.search(b[:5], k=1, ef=50)
    assert all(i >= 5000 for i in ids[:, 0])  # each b-query finds a b vector


def test_hnsw_dim_mismatch_and_save_load_errors(tmp_path):
    """Wrong-dim adds are typed errors; save to an unwritable path and load
    of a missing file raise OSError with the path named."""
    import numpy as np
    import pytest

    from kobato_eyes_tpu.index.hnsw import HnswIndex

    idx = HnswIndex(dim=8)
    with pytest.raises(ValueError, match="dim"):
        idx.add(np.zeros((2, 4), np.float32))
    idx.add(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    with pytest.raises(OSError, match="save failed"):
        idx.save(tmp_path / "no_such_dir" / "x.hnsw")
    with pytest.raises(OSError, match="load failed"):
        HnswIndex.load(tmp_path / "missing.hnsw", dim=8)
    # round-trip still works after the failures
    p = tmp_path / "ok.hnsw"
    idx.save(p)
    again = HnswIndex.load(p, dim=8)
    assert len(again) == 4 and again.dim == 8
