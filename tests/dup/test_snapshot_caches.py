"""Snapshot-token caches: prep columns and assembly memo.

``files_token`` is the caller's promise that the file snapshot is unchanged
(the catalog epoch version in the service; a constant in the bench). The
engine may then reuse its columnar prep and, when the device scan returns an
identical edge set, the assembled clusters. These tests pin the contract:
token reuse never changes results, token change fully invalidates, and
``None`` disables all snapshot reuse.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from kobato_eyes_tpu.dup.cpu_ref import CpuDuplicateScanner
from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig

from tests.dup.test_engine_parity import assert_clusters_equal, synth_files


def _cpu(files, cfg):
    return CpuDuplicateScanner(cfg).build_clusters(files)


def test_token_rescan_matches_cold_scan_and_cpu():
    rng = np.random.default_rng(41)
    files = synth_files(rng, 500, dup_groups=40)
    cfg = DuplicateScanConfig(hamming_threshold=8, size_ratio=0.5)
    scanner = TpuDuplicateScanner(cfg)
    cold = scanner.build_clusters(files, files_token="epoch-1")
    warm = scanner.build_clusters(files, files_token="epoch-1")
    warm2 = scanner.build_clusters(files, files_token="epoch-1")
    assert_clusters_equal(warm, cold)
    assert_clusters_equal(warm2, cold)
    assert cluster_ids(cold) == cluster_ids(_cpu(files, cfg))


def test_warm_rescan_hits_prep_and_memo():
    rng = np.random.default_rng(42)
    files = synth_files(rng, 400, dup_groups=30)
    cfg = DuplicateScanConfig(hamming_threshold=8)
    scanner = TpuDuplicateScanner(cfg)
    scanner.build_clusters(files, files_token=7)
    assert scanner._prep_cache is not None
    assert scanner._assembly_memo is not None
    prep_before = scanner._prep_cache
    out = scanner.build_clusters(files, files_token=7)
    # prep untouched (same tuple object) and memo returned a fresh outer list
    assert scanner._prep_cache is prep_before
    assert out is not scanner._assembly_memo[2]
    # mutating the returned list must not pollute the memo
    out.reverse()
    again = scanner.build_clusters(files, files_token=7)
    assert cluster_ids(again) == cluster_ids(list(reversed(out)))


def test_member_sequences_are_immutable_so_memo_sharing_is_safe():
    """The memo shares cluster objects across scans (outer-list copy only),
    which is sound because .files is an immutable tuple — caller-side
    reordering/filtering of members cannot exist, so it cannot poison the
    memo. Pin both halves of that argument."""
    import pytest

    rng = np.random.default_rng(47)
    files = synth_files(rng, 300, dup_groups=25)
    cfg = DuplicateScanConfig(hamming_threshold=8)
    scanner = TpuDuplicateScanner(cfg)
    first = scanner.build_clusters(files, files_token="t")
    want = [(c.keeper_id, [e.file.file_id for e in c.files]) for c in first]
    assert any(len(c.files) > 1 for c in first)
    assert all(isinstance(c.files, tuple) for c in first)
    with pytest.raises((TypeError, AttributeError)):
        first[0].files[0] = first[0].files[-1]  # type: ignore[index]
    again = scanner.build_clusters(files, files_token="t")
    assert [(c.keeper_id, [e.file.file_id for e in c.files]) for c in again] == want


def test_token_change_invalidates_everything():
    rng = np.random.default_rng(43)
    files = synth_files(rng, 300, dup_groups=20)
    cfg = DuplicateScanConfig(hamming_threshold=8)
    scanner = TpuDuplicateScanner(cfg)
    scanner.build_clusters(files, files_token="v1")

    # new snapshot: one file's phash flipped to join nothing (id stays)
    changed = list(files)
    f0 = changed[0]
    changed[0] = DuplicateFileMeta(
        file_id=f0.file_id, path=f0.path, size=f0.size, width=f0.width,
        height=f0.height, phash=f0.phash ^ 0xFFFF_FFFF,
    )
    got = scanner.build_clusters(changed, files_token="v2")
    want = _cpu(changed, cfg)
    assert cluster_ids(got) == cluster_ids(want)


def test_none_token_never_caches():
    rng = np.random.default_rng(44)
    files = synth_files(rng, 200, dup_groups=10)
    scanner = TpuDuplicateScanner(DuplicateScanConfig(hamming_threshold=8))
    scanner.build_clusters(files)
    assert scanner._prep_cache is None
    assert scanner._assembly_memo is None


def test_stale_token_with_different_files_is_callers_fault_but_none_is_safe():
    """Interleaving a token scan with a token=None scan of OTHER files must
    not corrupt the token scan (the None scan bypasses, not evicts)."""
    rng = np.random.default_rng(45)
    a = synth_files(rng, 300, dup_groups=25)
    b = synth_files(rng, 120, dup_groups=5)
    cfg = DuplicateScanConfig(hamming_threshold=8)
    scanner = TpuDuplicateScanner(cfg)
    first = scanner.build_clusters(a, files_token="a")
    scanner.build_clusters(b)  # unrelated, uncached
    again = scanner.build_clusters(a, files_token="a")
    assert_clusters_equal(again, first)
    assert cluster_ids(again) == cluster_ids(_cpu(a, cfg))


def test_sweep_accepts_token_and_matches_untokened():
    rng = np.random.default_rng(46)
    files = synth_files(rng, 300, dup_groups=25)
    cfg = DuplicateScanConfig(hamming_threshold=8)
    scanner = TpuDuplicateScanner(cfg)
    plain = scanner.build_clusters_sweep(files, range(0, 9))
    warm = scanner.build_clusters_sweep(files, range(0, 9), files_token="s1")
    warm2 = scanner.build_clusters_sweep(files, range(0, 9), files_token="s1")
    for t in range(0, 9):
        assert cluster_ids(plain[t]) == cluster_ids(warm[t]) == cluster_ids(warm2[t])
