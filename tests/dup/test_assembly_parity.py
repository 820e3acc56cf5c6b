"""Vectorized cluster assembly vs the reference-shaped Python spec."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from kobato_eyes_tpu.dup.types import (
    DuplicateFileMeta,
    assemble_clusters,
    assemble_clusters_py,
)

EXTS = [".png", ".jpg", ".webp", ".gif", ".bmp"]


def _random_case(rng, n_files=200, n_edges=300, missing_fraction=0.05):
    files = {}
    for fid in range(n_files):
        files[fid] = DuplicateFileMeta(
            file_id=fid,
            path=Path(f"/lib/d{fid % 7}/img_{fid:05d}{EXTS[fid % len(EXTS)]}"),
            size=int(rng.choice([0, 1000, 2000, 2000, 5000])),  # deliberate ties
            width=int(rng.choice([0, 100, 200])),
            height=int(rng.choice([0, 100, 200])),
            phash=int(rng.integers(0, 1 << 63)),
        )
    # some edges point at ids with no metadata (bad rows skipped upstream)
    id_pool = list(range(int(n_files * (1 + missing_fraction))))
    edges = []
    for _ in range(n_edges):
        a, b = rng.choice(id_pool, size=2, replace=False)
        h = None if rng.random() < 0.2 else int(rng.integers(0, 11))
        edges.append((int(a), int(b), h))
    return files, edges


def _canon(clusters):
    return [
        (
            c.keeper_id,
            [(e.file.file_id, e.best_hamming) for e in c.files],
        )
        for c in clusters
    ]


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_matches_spec(seed):
    rng = np.random.default_rng(seed)
    files, edges = _random_case(rng)
    assert _canon(assemble_clusters(files, edges)) == _canon(assemble_clusters_py(files, edges))


def test_empty_and_degenerate():
    assert assemble_clusters({}, []) == []
    f = DuplicateFileMeta(1, Path("/a.png"), 1, 1, 1, 0)
    # edge to a missing id -> singleton after filtering -> dropped
    assert assemble_clusters({1: f}, [(1, 2, 3)]) == []


def test_connectivity_through_missing_node():
    files = {
        1: DuplicateFileMeta(1, Path("/a.png"), 10, 1, 1, 0),
        3: DuplicateFileMeta(3, Path("/b.png"), 20, 1, 1, 0),
    }
    # 1-2 and 2-3: node 2 has no metadata but must still connect 1 and 3
    edges = [(1, 2, 4), (2, 3, 5)]
    got = assemble_clusters(files, edges)
    spec = assemble_clusters_py(files, edges)
    assert _canon(got) == _canon(spec)
    assert len(got) == 1 and {e.file.file_id for e in got[0].files} == {1, 3}
