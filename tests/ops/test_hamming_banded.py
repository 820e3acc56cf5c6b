"""Windowed banded scan vs the brute-force numpy spec."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.ops.hamming import (
    band_keys_np,
    bucket_ok_np,
    edge_scan_banded,
    edge_scan_np,
)
from kobato_eyes_tpu.utils.bits import u64_to_u32pair


def _edges_set(ei, ej, ed):
    return {(int(a), int(b), int(d)) for a, b, d in zip(ei, ej, ed)}


def _population(rng, n, dup_fraction=0.4):
    n_dups = int(n * dup_fraction)
    orig = rng.integers(0, 1 << 64, size=n - n_dups, dtype=np.uint64)
    src = rng.integers(0, len(orig), size=n_dups)
    dups = orig[src].copy()
    for i in range(n_dups):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 6))):
            dups[i] ^= np.uint64(1) << np.uint64(bit)
    out = np.concatenate([orig, dups])
    rng.shuffle(out)
    return out


@pytest.mark.parametrize("threshold", [0, 4, 8])
def test_banded_matches_bruteforce(rng, threshold):
    ph = _population(rng, 300)
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    pairs = u64_to_u32pair(ph)
    bi, bj, bd = edge_scan_banded(pairs, keys, ok, hamming_threshold=threshold)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=threshold)
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


def test_banded_with_size_ratio(rng):
    ph = _population(rng, 200)
    sizes = rng.integers(1_000, 1_000_000, size=200).astype(np.float64)
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    pairs = u64_to_u32pair(ph)
    bi, bj, bd = edge_scan_banded(
        pairs, keys, ok, hamming_threshold=8, sizes=sizes, size_ratio=0.5
    )
    ni, nj, nd = edge_scan_np(
        ph, keys, ok, hamming_threshold=8, sizes=sizes, size_ratio=0.5
    )
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


def test_oversized_bucket_fallback(rng):
    # Force a giant bucket (identical hashes) and a tiny window so the exact
    # host fallback path handles it.
    base = np.uint64(0x0123456789ABCDEF)
    ph = np.full(64, base, dtype=np.uint64)
    extra = _population(rng, 100)
    ph = np.concatenate([ph, extra])
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    pairs = u64_to_u32pair(ph)
    bi, bj, bd = edge_scan_banded(pairs, keys, ok, hamming_threshold=8, max_window=4)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=8)
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


def test_bucket_pair_cap_respected(rng):
    # Buckets whose pair count exceeds the cap are skipped entirely.
    base = np.uint64(0xDEADBEEF00000000)
    ph = np.concatenate([np.full(50, base, dtype=np.uint64), _population(rng, 100)])
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, 100)  # 50*49/2 = 1225 > 100 -> capped
    pairs = u64_to_u32pair(ph)
    bi, bj, bd = edge_scan_banded(pairs, keys, ok, hamming_threshold=8, max_window=8)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=8)
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


def test_empty_and_tiny():
    empty = edge_scan_banded(
        np.zeros((0, 2), np.uint32), np.zeros((0, 4), np.uint64),
        np.ones((0, 4), bool), hamming_threshold=8,
    )
    assert all(len(x) == 0 for x in empty)
    one = edge_scan_banded(
        np.zeros((1, 2), np.uint32), np.zeros((1, 4), np.uint64),
        np.ones((1, 4), bool), hamming_threshold=8,
    )
    assert all(len(x) == 0 for x in one)
