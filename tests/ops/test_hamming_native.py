"""Native C++ band scan (native/hamming_scan.cpp) vs the numpy spec path.

host_window_scan's numpy pipeline is the executable spec (itself pinned to
the reference's bucket semantics, src/dup/scanner.py:227-298); the native
scan must produce the identical edge list — values AND order — across
band configs, thresholds, caps, and the size-ratio filter.
"""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.ops import hamming
from kobato_eyes_tpu.ops.hamming import _native_band_scan, host_window_scan


def _numpy_scan(ph, **kw):
    """Spec path with the native lane disabled."""
    orig = hamming._NATIVE_SCAN_UNAVAILABLE
    hamming._NATIVE_SCAN_UNAVAILABLE = True
    try:
        return host_window_scan(ph, **kw)
    finally:
        hamming._NATIVE_SCAN_UNAVAILABLE = orig


def _population(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n_dups = n // 3
    originals = rng.integers(0, 1 << 64, size=n - n_dups, dtype=np.uint64)
    src = rng.integers(0, len(originals), size=n_dups)
    dups = originals[src].copy()
    for i in range(n_dups):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 7))):
            dups[i] ^= np.uint64(1) << np.uint64(bit)
    out = np.concatenate([originals, dups])
    rng.shuffle(out)
    return out


def _native_available() -> bool:
    probe = _native_band_scan(
        np.zeros(2, np.uint64), band_bits=16, band_count=4,
        hamming_threshold=0, sizes=None, size_ratio=None, bucket_pair_cap=None,
    )
    return probe is not None


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("band_bits,band_count", [(16, 4), (8, 8), (32, 2)])
def test_native_matches_numpy_spec(seed, band_bits, band_count):
    ph = _population(3000, seed)
    kw = dict(
        band_bits=band_bits, band_count=band_count, hamming_threshold=8
    )
    ni, nj, nd = _native_band_scan(
        ph, sizes=None, size_ratio=None, bucket_pair_cap=None, **kw
    )
    si, sj, sd = _numpy_scan(ph, **kw)
    np.testing.assert_array_equal(ni, si)
    np.testing.assert_array_equal(nj, sj)
    np.testing.assert_array_equal(nd, sd)


def test_native_respects_pair_cap():
    # a planted mega-bucket: many files share band 0's key
    rng = np.random.default_rng(7)
    ph = rng.integers(0, 1 << 64, size=2000, dtype=np.uint64)
    ph[:300] = (ph[:300] & ~np.uint64(0xFFFF)) | np.uint64(0x1234)
    for cap in (None, 10, 1000):
        kw = dict(band_bits=16, band_count=4, hamming_threshold=12)
        native = _native_band_scan(
            ph, sizes=None, size_ratio=None, bucket_pair_cap=cap, **kw
        )
        spec = _numpy_scan(ph, bucket_pair_cap=cap, **kw)
        for a, b in zip(native, spec):
            np.testing.assert_array_equal(a, b)


def test_native_size_ratio_exact_f64():
    rng = np.random.default_rng(3)
    ph = _population(2000, 3)
    sizes = rng.integers(0, 5_000_000, size=2000).astype(np.float64)
    sizes[::97] = 0.0  # unknown sizes pass the filter (reference semantics)
    kw = dict(band_bits=16, band_count=4, hamming_threshold=10)
    native = _native_band_scan(
        ph, sizes=sizes, size_ratio=0.8, bucket_pair_cap=None, **kw
    )
    spec = _numpy_scan(ph, sizes=sizes, size_ratio=0.8, **kw)
    for a, b in zip(native, spec):
        np.testing.assert_array_equal(a, b)


def test_native_empty_and_tiny():
    for n in (0, 1, 2):
        ph = np.arange(n, dtype=np.uint64)
        out = _native_band_scan(
            ph, band_bits=16, band_count=4, hamming_threshold=8,
            sizes=None, size_ratio=None, bucket_pair_cap=None,
        )
        assert out is not None
        assert all(len(a) == len(out[0]) for a in out)


def test_host_window_scan_routes_native_and_matches():
    """The public entry must give identical results whichever lane runs."""
    ph = _population(5000, 11)
    kw = dict(band_bits=16, band_count=4, hamming_threshold=8)
    via_entry = host_window_scan(ph, **kw)
    spec = _numpy_scan(ph, **kw)
    for a, b in zip(via_entry, spec):
        np.testing.assert_array_equal(a, b)
