"""Scale-aware ANN routing: HNSW below the build-wall cap, device above it."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.index.auto import (
    DEFAULT_FLAT_MIN,
    build_auto_index,
    hnsw_max_vectors,
    load_auto_index,
    save_auto_index,
)
from kobato_eyes_tpu.index.flat import FlatIndex
from kobato_eyes_tpu.index.hnsw import HnswIndex
from kobato_eyes_tpu.index.ivf import IvfFlatIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 32)).astype(np.float32)
    ids = np.arange(1000, 1000 + len(vecs), dtype=np.int64)
    return vecs, ids


def test_routes_hnsw_below_cap(corpus):
    vecs, ids = corpus
    idx = build_auto_index(vecs, ids)
    assert isinstance(idx, HnswIndex)
    assert len(idx) == len(vecs)


def test_routes_flat_when_over_cap_but_small(corpus):
    vecs, ids = corpus
    idx = build_auto_index(vecs, ids, hnsw_max=100)  # force past the cap
    assert isinstance(idx, FlatIndex)
    # exact search agrees with a directly-built flat index
    q = vecs[:5]
    s1, i1 = idx.search(q, k=7)
    s2, i2 = FlatIndex(vecs, ids).search(q, k=7)
    assert np.array_equal(i1, i2)


def test_routes_ivf_at_scale():
    rng = np.random.default_rng(4)
    n = DEFAULT_FLAT_MIN + 512
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    idx = build_auto_index(vecs, hnsw_max=100)
    assert isinstance(idx, IvfFlatIndex)
    _, ids_out = idx.search(vecs[:3], k=5, nprobe=idx.n_lists)
    assert (ids_out[:, 0] == np.arange(3)).all()  # self-recall@1 with full probe


def test_env_cap_override(monkeypatch):
    monkeypatch.setenv("KET_ANN_HNSW_MAX", "12345")
    assert hnsw_max_vectors() == 12345
    monkeypatch.setenv("KET_ANN_HNSW_MAX", "bogus")
    assert hnsw_max_vectors() == 300_000


@pytest.mark.parametrize("cap", [10_000, 100])
def test_save_load_roundtrip(tmp_path, corpus, cap):
    vecs, ids = corpus
    idx = build_auto_index(vecs, ids, hnsw_max=cap)
    path = tmp_path / "clip.hnsw"
    save_auto_index(idx, path)
    assert path.with_suffix(".meta.json").exists()
    loaded = load_auto_index(path, dim=vecs.shape[1])
    assert type(loaded) is type(idx)
    q = vecs[10:14]
    s1, i1 = idx.search(q, k=5)
    s2, i2 = loaded.search(q, k=5)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_legacy_graph_loads_without_sidecar(tmp_path, corpus):
    vecs, ids = corpus
    idx = HnswIndex(dim=vecs.shape[1])
    idx.add(vecs, ids)
    path = tmp_path / "clip.hnsw"
    idx.save(path)  # pre-auto-index graph: no .meta.json
    loaded = load_auto_index(path, dim=vecs.shape[1])
    assert isinstance(loaded, HnswIndex)
    assert len(loaded) == len(vecs)


def test_reload_routes_by_recorded_kind(tmp_path):
    """An IvfFlatIndex saved below DEFAULT_FLAT_MIN must round-trip to
    IvfFlatIndex (recall semantics of the class it was built as), not be
    re-routed to FlatIndex by size (ADVICE r4)."""
    from kobato_eyes_tpu.index.ivf import IvfFlatIndex

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(500, 16)).astype(np.float32)
    idx = IvfFlatIndex(vecs, n_clusters=4)
    path = tmp_path / "small_ivf.idx"
    save_auto_index(idx, path)
    loaded = load_auto_index(path, dim=16)
    assert isinstance(loaded, IvfFlatIndex)


def test_reload_preserves_unnormalized_flat_corpus(tmp_path):
    """FlatIndex(normalize=False) must not be re-normalized on reload."""
    from kobato_eyes_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(200, 8)).astype(np.float32) * 7.0  # non-unit rows
    idx = FlatIndex(vecs, normalize=False)
    path = tmp_path / "raw_flat.idx"
    save_auto_index(idx, path)
    loaded = load_auto_index(path, dim=8)
    assert isinstance(loaded, FlatIndex)
    assert loaded.normalize is False
    q = vecs[:5]
    s0, i0 = idx.search(q, k=3)
    s1, i1 = loaded.search(q, k=3)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
