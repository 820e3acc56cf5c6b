"""Cluster-parity tests: TPU engine vs CPU bucket-loop baseline.

Acceptance criterion from BASELINE.md: identical duplicate clusters at equal
config — keeper ids, member ordering, cluster ordering, best-hamming values.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from kobato_eyes_tpu.dup.cpu_ref import CpuDuplicateScanner
from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig


def synth_files(
    rng: np.random.Generator,
    n: int,
    *,
    dup_groups: int,
    group_size: int = 3,
    flip_bits: int = 4,
    embed_dim: int | None = None,
) -> list[DuplicateFileMeta]:
    """Random 64-bit hashes with planted near-duplicate groups."""
    hashes = rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)
    hashes = hashes | (rng.integers(0, 2, size=n).astype(np.uint64) << np.uint64(63))
    for g in range(dup_groups):
        base = int(hashes[g * group_size])
        for k in range(1, group_size):
            idx = g * group_size + k
            h = base
            for bit in rng.choice(64, size=rng.integers(0, flip_bits + 1), replace=False):
                h ^= 1 << int(bit)
            hashes[idx] = h
    exts = [".png", ".jpg", ".webp", ".gif", ".bmp"]
    files = []
    for i in range(n):
        emb = None
        if embed_dim is not None:
            v = rng.normal(size=embed_dim)
            emb = tuple(float(x) for x in v)
        files.append(
            DuplicateFileMeta(
                file_id=1000 + i,
                path=Path(f"/data/set{i % 7}/img_{i:05d}{exts[i % len(exts)]}"),
                size=int(rng.integers(1_000, 5_000_000)),
                width=int(rng.integers(100, 4000)),
                height=int(rng.integers(100, 4000)),
                phash=int(hashes[i]),
                embedding=emb,
            )
        )
    return files


def assert_clusters_equal(got, want):
    assert cluster_ids(got) == cluster_ids(want)
    for cg, cw in zip(got, want):
        assert cg.keeper_id == cw.keeper_id
        for eg, ew in zip(cg.files, cw.files):
            assert eg.file.file_id == ew.file.file_id
            assert eg.best_hamming == ew.best_hamming


@pytest.mark.parametrize("n,groups", [(50, 5), (400, 40), (1000, 120)])
def test_parity_default_config(rng, n, groups):
    files = synth_files(rng, n, dup_groups=groups)
    cfg = DuplicateScanConfig()
    assert_clusters_equal(
        TpuDuplicateScanner(cfg).build_clusters(files),
        CpuDuplicateScanner(cfg).build_clusters(files),
    )


def test_parity_with_size_ratio(rng):
    files = synth_files(rng, 300, dup_groups=30)
    cfg = DuplicateScanConfig(size_ratio=0.5, hamming_threshold=10)
    assert_clusters_equal(
        TpuDuplicateScanner(cfg).build_clusters(files),
        CpuDuplicateScanner(cfg).build_clusters(files),
    )


def test_parity_with_bucket_pair_cap(rng):
    # Force dense buckets by planting many files sharing low band bits
    files = synth_files(rng, 300, dup_groups=10, flip_bits=2)
    cfg = DuplicateScanConfig(bucket_pair_cap=50, hamming_threshold=12)
    assert_clusters_equal(
        TpuDuplicateScanner(cfg).build_clusters(files),
        CpuDuplicateScanner(cfg).build_clusters(files),
    )


def test_parity_with_cosine_filter(rng):
    files = synth_files(rng, 200, dup_groups=20, embed_dim=16)
    cfg = DuplicateScanConfig(cosine_threshold=0.0, hamming_threshold=10)
    assert_clusters_equal(
        TpuDuplicateScanner(cfg).build_clusters(files),
        CpuDuplicateScanner(cfg).build_clusters(files),
    )


def test_parity_alternate_band_config(rng):
    files = synth_files(rng, 256, dup_groups=25)
    cfg = DuplicateScanConfig(band_bits=8, band_count=8, hamming_threshold=6)
    assert_clusters_equal(
        TpuDuplicateScanner(cfg).build_clusters(files),
        CpuDuplicateScanner(cfg).build_clusters(files),
    )


def test_empty_and_tiny_inputs():
    cfg = DuplicateScanConfig()
    assert TpuDuplicateScanner(cfg).build_clusters([]) == []
    one = DuplicateFileMeta(1, Path("/a.png"), 10, 10, 10, 42)
    assert TpuDuplicateScanner(cfg).build_clusters([one]) == []


def test_identical_hashes_cluster_together():
    cfg = DuplicateScanConfig()
    files = [
        DuplicateFileMeta(1, Path("/a/x.png"), 100, 50, 50, 0x1234ABCD5678EF00),
        DuplicateFileMeta(2, Path("/a/y.jpg"), 200, 50, 50, 0x1234ABCD5678EF00),
        DuplicateFileMeta(3, Path("/a/z.jpg"), 300, 50, 50, -42),
    ]
    clusters = TpuDuplicateScanner(cfg).build_clusters(files)
    assert len(clusters) == 1
    # keeper: larger size wins -> id 2 (size 200) over id 1
    assert clusters[0].keeper_id == 2
    assert [e.file.file_id for e in clusters[0].files] == [2, 1]
    assert clusters[0].files[0].best_hamming == 0


def test_duplicate_file_id_rows_do_not_self_pair():
    cfg = DuplicateScanConfig()
    files = [
        DuplicateFileMeta(7, Path("/a/x.png"), 100, 10, 10, 99),
        DuplicateFileMeta(7, Path("/a/x.png"), 100, 10, 10, 99),
    ]
    assert TpuDuplicateScanner(cfg).build_clusters(files) == []


def test_edge_scan_matches_numpy_bruteforce(rng):
    from kobato_eyes_tpu.ops.hamming import band_keys_np, bucket_ok_np, edge_scan, edge_scan_np

    n = 500
    ph = rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)
    # plant near dups
    for k in range(0, 100, 2):
        ph[k + 1] = ph[k] ^ np.uint64(1 << int(rng.integers(0, 64)))
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    ph_pairs = np.stack(
        [(ph >> np.uint64(32)).astype(np.uint32), (ph & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
        axis=-1,
    )
    gi, gj, gd = edge_scan(ph_pairs, keys, ok, hamming_threshold=8, block=128)
    wi, wj, wd = edge_scan_np(ph, keys, ok, hamming_threshold=8)
    got = sorted(zip(gi.tolist(), gj.tolist(), gd.tolist()))
    want = sorted(zip(wi.tolist(), wj.tolist(), wd.tolist()))
    assert got == want


def test_threshold_sweep_matches_individual_scans(rng):
    """One sweep scan == separate scans at each threshold (cluster identity)."""
    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig
    from pathlib import Path
    import numpy as np

    n, n_dups = 150, 50
    orig = rng.integers(0, 1 << 64, size=n - n_dups, dtype=np.uint64)
    dups = orig[rng.integers(0, len(orig), size=n_dups)].copy()
    for i in range(n_dups):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 8))):
            dups[i] ^= np.uint64(1) << np.uint64(bit)
    hashes = np.concatenate([orig, dups])
    rng.shuffle(hashes)
    files = [
        DuplicateFileMeta(i, Path(f"/s/{i:04d}.png"), 1000 + i, None, None, int(hashes[i]))
        for i in range(n)
    ]
    sweep = TpuDuplicateScanner(DuplicateScanConfig()).build_clusters_sweep(
        files, thresholds=[0, 2, 4, 8]
    )
    for t in (0, 2, 4, 8):
        single = TpuDuplicateScanner(
            DuplicateScanConfig(hamming_threshold=t)
        ).build_clusters(files)
        assert cluster_ids(sweep[t]) == cluster_ids(single), t
