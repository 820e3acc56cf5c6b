"""Resident scanner (device band keys + sort) vs the brute-force spec."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.ops.hamming import (
    BandedHammingScanner,
    band_keys_np,
    bucket_ok_np,
    edge_scan_np,
)


def _edges_set(ei, ej, ed):
    return {(int(a), int(b), int(d)) for a, b, d in zip(ei, ej, ed)}


def _population(rng, n):
    n_dups = n // 3
    orig = rng.integers(0, 1 << 64, size=n - n_dups, dtype=np.uint64)
    dups = orig[rng.integers(0, len(orig), size=n_dups)].copy()
    for i in range(n_dups):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 6))):
            dups[i] ^= np.uint64(1) << np.uint64(bit)
    out = np.concatenate([orig, dups])
    rng.shuffle(out)
    return out


@pytest.mark.parametrize("host_scan_max", [0, None], ids=["device", "host"])
@pytest.mark.parametrize("band_bits,band_count", [(16, 4), (8, 8), (32, 2)])
def test_resident_matches_spec(rng, band_bits, band_count, host_scan_max):
    ph = _population(rng, 250)
    scanner = BandedHammingScanner(
        band_bits=band_bits, band_count=band_count, host_scan_max=host_scan_max
    )
    bi, bj, bd = scanner.scan(ph, hamming_threshold=8)
    keys = band_keys_np(ph, band_bits, band_count)
    ok = bucket_ok_np(keys, None)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=8)
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


def test_resident_cache_reuse(rng):
    ph = _population(rng, 150)
    scanner = BandedHammingScanner(host_scan_max=0)  # device path: resident cache
    a = scanner.scan(ph, hamming_threshold=8)
    digest_after_first = scanner._digest
    b = scanner.scan(ph, hamming_threshold=8)  # same data -> no re-upload
    assert scanner._digest == digest_after_first
    assert _edges_set(*a) == _edges_set(*b)
    # different threshold on resident data still correct
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    c = scanner.scan(ph, hamming_threshold=2)
    n = edge_scan_np(ph, keys, ok, hamming_threshold=2)
    assert _edges_set(*c) == _edges_set(*n)


def test_resident_size_ratio_and_cap(rng):
    base = np.uint64(0xABCD_EF01_2345_6789)
    ph = np.concatenate([np.full(40, base, dtype=np.uint64), _population(rng, 120)])
    sizes = rng.integers(1, 1_000_000, size=len(ph)).astype(np.float64)
    scanner = BandedHammingScanner(max_window=8, host_scan_max=0)  # oversized fallback
    bi, bj, bd = scanner.scan(
        ph, hamming_threshold=8, sizes=sizes, size_ratio=0.5, bucket_pair_cap=500
    )
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, 500)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=8, sizes=sizes, size_ratio=0.5)
    assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


@pytest.mark.parametrize("run_len", [60, 140])
def test_resident_wide_window_multiplane(rng, run_len):
    """Populations with bucket runs > 32 take the multi-plane bitmask kernel
    (run 60 -> window 64 = 2 uint32 planes, run 140 -> window 256 = 8);
    edge parity with the brute-force spec must hold there too."""
    # run_len hashes sharing band 0 (same low 16 bits) force max_run >= run_len
    base = np.uint64(0xABCD)
    ph = np.array(
        [(np.uint64(int(rng.integers(0, 1 << 48))) << np.uint64(16)) | base
         for _ in range(run_len)]
        + list(rng.integers(0, 1 << 64, size=80, dtype=np.uint64)),
        dtype=np.uint64,
    )
    sc = BandedHammingScanner(max_window=256, host_scan_max=0)
    ei, ej, d = sc.scan(ph, hamming_threshold=10)
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=10)
    assert _edges_set(ei, ej, d) == _edges_set(ni, nj, nd)


@pytest.mark.parametrize("cap", [None, 50])
def test_host_path_matches_spec_fuzz(rng, cap):
    """host_window_scan routing: exact parity with the brute-force spec,
    including pair caps, size ratios, and oversized-run fallback."""
    for trial in range(6):
        n = int(rng.integers(3, 400))
        ph = _population(rng, n)
        if trial % 2:  # plant a pathological shared-band run (> d_limit forcing)
            ph[: n // 2] = (ph[: n // 2] >> np.uint64(16)) << np.uint64(16) | np.uint64(0xBEEF)
        sizes = rng.integers(1, 1_000_000, size=len(ph)).astype(np.float64)
        sc = BandedHammingScanner()
        assert len(ph) <= sc.host_scan_max  # must route host
        bi, bj, bd = sc.scan(
            ph, hamming_threshold=9, sizes=sizes, size_ratio=0.5, bucket_pair_cap=cap
        )
        keys = band_keys_np(ph, 16, 4)
        ok = bucket_ok_np(keys, cap)
        ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=9, sizes=sizes, size_ratio=0.5)
        assert _edges_set(bi, bj, bd) == _edges_set(ni, nj, nd)


def test_host_path_oversized_run_d_limit(rng):
    """Runs longer than the host d_limit go through the all-pairs fallback."""
    from kobato_eyes_tpu.ops.hamming import host_window_scan

    base = np.uint64(0xABCD)
    n_run = 300  # > d_limit 256
    ph = np.array(
        [(np.uint64(int(rng.integers(0, 1 << 40))) << np.uint64(16)) | base
         for _ in range(n_run)]
        + list(rng.integers(0, 1 << 64, size=60, dtype=np.uint64)),
        dtype=np.uint64,
    )
    ei, ej, d = host_window_scan(
        ph, band_bits=16, band_count=4, hamming_threshold=12
    )
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=12)
    assert _edges_set(ei, ej, d) == _edges_set(ni, nj, nd)
