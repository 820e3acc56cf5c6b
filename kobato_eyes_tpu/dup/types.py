"""Duplicate-engine data model.

Cluster identity rules (keeper choice, member ordering, cluster ordering,
extension priorities) replicate the reference exactly
(``src/dup/scanner.py:16-28,320-415``) because cluster *identity*, not just
similarity, is the acceptance criterion (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

# Reference extension priority table (scanner.py:16-28): lossless > lossy.
EXTENSION_PRIORITY = {
    "png": 4,
    "apng": 4,
    "webp": 3,
    "tiff": 2,
    "tif": 2,
    "bmp": 1,
    "gif": 1,
    "jpeg": 0,
    "jpg": 0,
    "jpe": 0,
    "jfif": 0,
}


@dataclass(frozen=True)
class DuplicateFileMeta:
    """Metadata needed to cluster one file."""

    file_id: int
    path: Path
    size: int | None
    width: int | None
    height: int | None
    phash: int  # unsigned or signed 64-bit int
    embedding: tuple[float, ...] | None = None

    @property
    def resolution(self) -> int:
        return (self.width or 0) * (self.height or 0)

    @property
    def extension_priority(self) -> int:
        return EXTENSION_PRIORITY.get(self.path.suffix.lower().lstrip("."), 0)


@dataclass(frozen=True)
class DuplicateClusterEntry:
    file: DuplicateFileMeta
    best_hamming: int | None


@dataclass(frozen=True)
class DuplicateCluster:
    files: list[DuplicateClusterEntry]
    keeper_id: int


@dataclass(frozen=True)
class DuplicateScanConfig:
    """Candidate-generation thresholds (reference scanner.py:147-167)."""

    hamming_threshold: int = 8
    size_ratio: float | None = None
    band_bits: int = 16
    band_count: int = 4
    cosine_threshold: float | None = None
    bucket_pair_cap: int | None = None

    def __post_init__(self) -> None:
        if self.band_bits <= 0:
            raise ValueError("band_bits must be positive")
        if self.band_count <= 0:
            raise ValueError("band_count must be positive")
        if self.band_bits * self.band_count > 64:
            raise ValueError("band config too large")
        if not (0 <= self.hamming_threshold <= 64):
            raise ValueError("hamming_threshold must be in [0, 64]")
        if self.cosine_threshold is not None and not (-1.0 <= self.cosine_threshold <= 1.0):
            raise ValueError("cosine_threshold must be between -1.0 and 1.0")


def keeper_key(file: DuplicateFileMeta) -> tuple:
    """Keeper selection key (min wins); reference scanner.py:402-415."""
    return (
        -(file.size or 0),
        -file.resolution,
        -file.extension_priority,
        file.path.suffix.lower(),
        file.path.name.lower(),
        file.file_id,
    )


def entry_sort_key(entry: DuplicateClusterEntry, keeper_id: int) -> tuple:
    """Member ordering inside a cluster; reference scanner.py:338-349."""
    f = entry.file
    return (
        0 if f.file_id == keeper_id else 1,
        -(f.size or 0),
        -f.resolution,
        -f.extension_priority,
        f.path.name.lower(),
        f.file_id,
    )


def cluster_sort_key(cluster: DuplicateCluster) -> tuple:
    """Cluster ordering; reference scanner.py:350-356."""
    return (
        -max(entry.file.size or 0 for entry in cluster.files),
        cluster.files[0].file.path.as_posix().lower(),
    )


def assemble_clusters(
    files_by_id: dict[int, DuplicateFileMeta],
    edges: Sequence[tuple[int, int, int | None]],
) -> list[DuplicateCluster]:
    """Edges (file_id_a, file_id_b, hamming) -> ordered clusters.

    Implements the reference's DSU + assembly semantics exactly
    (scanner.py:304-356): union all edges, track per-file best (minimum)
    hamming, group by root, drop singletons, order members and clusters.
    """
    from kobato_eyes_tpu.dup.dsu import DisjointSet

    dsu = DisjointSet()
    best_hamming: dict[int, int] = {}
    touched: set[int] = set()
    for a, b, h in edges:
        dsu.union(a, b)
        touched.add(a)
        touched.add(b)
        if h is not None:
            for fid in (a, b):
                cur = best_hamming.get(fid)
                if cur is None or h < cur:
                    best_hamming[fid] = h

    groups: dict[int, list[int]] = {}
    for fid in touched:
        groups.setdefault(dsu.find(fid), []).append(fid)

    clusters: list[DuplicateCluster] = []
    for members in groups.values():
        if len(members) < 2:
            continue
        entries = [
            DuplicateClusterEntry(file=files_by_id[fid], best_hamming=best_hamming.get(fid))
            for fid in sorted(members)
            if fid in files_by_id
        ]
        if len(entries) < 2:
            continue
        keeper_id = min(entries, key=lambda e: keeper_key(e.file)).file.file_id
        entries.sort(key=lambda e: entry_sort_key(e, keeper_id))
        clusters.append(DuplicateCluster(files=entries, keeper_id=keeper_id))

    clusters.sort(key=cluster_sort_key)
    return clusters
