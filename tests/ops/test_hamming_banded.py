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


def test_size_ratio_f64_boundary_parity():
    """Sizes > 2^24 bytes quantize in f32; the edge decision must still match
    the exact-f64 spec at the ratio boundary (device result is post-filtered
    on host in f64)."""
    from kobato_eyes_tpu.ops.hamming import BandedHammingScanner

    # identical hashes -> hamming 0, so only the size filter decides
    ph = np.array([1234567890123, 1234567890123, 1234567890123], dtype=np.uint64)
    # pair (0,1): exact ratio 0.5 + 15/2^28, but both sizes round UP in f32 so
    # the f32 ratio is 0.5 + 16/2^28 — f32 passes thr, exact f64 fails it.
    # pair (0,2)/(1,2): tiny size -> exact ratio far below thr -> always out.
    a = float(2**27 + 15)
    b = float(2**28)
    thr = float(np.float32(0.5 + 16 / 2**28))
    sizes = np.array([a, b, 10.0], dtype=np.float64)
    assert (a / b) < thr <= float(np.float32(a) / np.float32(b))

    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    pairs = u64_to_u32pair(ph)

    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=8, sizes=sizes, size_ratio=thr)
    bi, bj, bd = edge_scan_banded(
        pairs, keys, ok, hamming_threshold=8, sizes=sizes, size_ratio=thr
    )
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd) == set()

    ri, rj, rd = BandedHammingScanner().scan(
        ph, hamming_threshold=8, sizes=sizes, size_ratio=thr
    )
    assert _edges_set(ri, rj, rd) == set()

    # opposite rounding direction: exact passes, naive f32 would drop — the
    # relaxed device threshold keeps it and the exact check confirms it.
    a2 = float(2**27 + 7)  # rounds DOWN in f32
    sizes2 = np.array([a2, b, 10.0], dtype=np.float64)
    thr2 = a2 / b  # exact boundary: pair passes in f64
    ni2, nj2, _ = edge_scan_np(ph, keys, ok, hamming_threshold=8, sizes=sizes2, size_ratio=thr2)
    bi2, bj2, _ = edge_scan_banded(
        pairs, keys, ok, hamming_threshold=8, sizes=sizes2, size_ratio=thr2
    )
    assert {(int(i), int(j)) for i, j in zip(bi2, bj2)} == \
        {(int(i), int(j)) for i, j in zip(ni2, nj2)} == {(0, 1)}
