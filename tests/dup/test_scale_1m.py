"""1M-image scale checks (BASELINE config 5) — slow-marked, excluded by default."""

from __future__ import annotations

import time

import numpy as np
import pytest

from kobato_eyes_tpu.ops.hamming import BandedHammingScanner

pytestmark = pytest.mark.slow


def test_million_hash_scan_completes(rng):
    n = 1_000_000
    n_dups = 100_000
    orig = rng.integers(0, 1 << 64, size=n - n_dups, dtype=np.uint64)
    dups = orig[rng.integers(0, len(orig), size=n_dups)].copy()
    for bit in range(4):  # flip a couple of bits on a subset
        mask = rng.random(n_dups) < 0.5
        dups[mask] ^= np.uint64(1) << rng.integers(0, 64, dtype=np.uint64)
    hashes = np.concatenate([orig, dups])
    rng.shuffle(hashes)

    scanner = BandedHammingScanner(max_edges_hint=1 << 20)
    t0 = time.perf_counter()
    ei, ej, d = scanner.scan(hashes, hamming_threshold=8)
    elapsed = time.perf_counter() - t0
    # every planted duplicate pair must be found (cluster-level: >= n_dups edges)
    assert len(ei) >= n_dups * 0.99
    assert (d <= 8).all()
    assert (ei < ej).all()
    # sanity: pair space is 5e11; the scan must be nowhere near brute force
    assert elapsed < 600
