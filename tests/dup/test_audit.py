"""Cluster cohesion audit (dup/audit.py) vs its numpy spec."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from kobato_eyes_tpu.dup.audit import (
    ClusterCohesion,
    audit_clusters,
    audit_clusters_np,
    summarize,
)
from kobato_eyes_tpu.dup.types import (
    DuplicateCluster,
    DuplicateClusterEntry,
    DuplicateFileMeta,
)


def _cluster(rng, fid0: int, size: int) -> DuplicateCluster:
    base = int(rng.integers(0, 1 << 63))
    entries = []
    for k in range(size):
        h = base
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 5))):
            h ^= 1 << int(bit)
        meta = DuplicateFileMeta(
            file_id=fid0 + k, path=Path(f"/a/{fid0 + k}.png"), size=1000,
            width=None, height=None, phash=h,
        )
        entries.append(DuplicateClusterEntry(file=meta, best_hamming=None))
    return DuplicateCluster(files=entries, keeper_id=fid0 + int(rng.integers(size)))


def _make(rng, sizes):
    out = []
    fid = 0
    for s in sizes:
        out.append(_cluster(rng, fid, s))
        fid += s
    return out


def assert_same(got: list[ClusterCohesion], want: list[ClusterCohesion]):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.keeper_id, g.size, g.diameter, g.keeper_max) == (
            w.keeper_id, w.size, w.diameter, w.keeper_max,
        )
        assert g.mean_distance == pytest.approx(w.mean_distance)


def test_audit_matches_np_spec():
    rng = np.random.default_rng(11)
    clusters = _make(rng, [2, 3, 7, 2, 12, 5])
    assert_same(audit_clusters(clusters), audit_clusters_np(clusters))


def test_audit_batch_splits_preserve_order_and_values():
    rng = np.random.default_rng(12)
    clusters = _make(rng, [30, 30, 30, 30, 30])
    # force multiple batches (batch bound below total members)
    got = audit_clusters(clusters, batch_hashes=64)
    assert_same(got, audit_clusters_np(clusters))


def test_audit_oversized_cluster_striped():
    rng = np.random.default_rng(13)
    clusters = _make(rng, [5, 300, 4])  # 300 > batch bound -> stripe path
    got = audit_clusters(clusters, batch_hashes=128)
    assert_same(got, audit_clusters_np(clusters))


def test_audit_diameter_catches_chained_members():
    """Two members 20 bits apart chained through a middle hash must surface
    diameter ~20 even though each edge is within threshold."""
    a = 0
    b = (1 << 10) - 1  # 10 bits from a
    c = ((1 << 10) - 1) << 10  # 10 bits from a, 20 from b
    entries = [
        DuplicateClusterEntry(
            DuplicateFileMeta(i, Path(f"/c/{i}.png"), 1, None, None, h), None
        )
        for i, h in enumerate([a, b, c])
    ]
    cl = DuplicateCluster(files=entries, keeper_id=0)
    (stats,) = audit_clusters([cl])
    assert stats.diameter == 20
    assert stats.keeper_max == 10  # keeper a is 10 from both


def test_summarize_mentions_loosest():
    rng = np.random.default_rng(14)
    clusters = _make(rng, [3, 4])
    text = summarize(audit_clusters(clusters))
    assert "clusters" in text and "diameter" in text and "loose:" in text
    assert summarize([]) == "audit: no clusters"
