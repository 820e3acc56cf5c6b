"""Crossover probe (ops/hamming.py:probe_crossover) sanity + env routing."""

from __future__ import annotations

import numpy as np

from kobato_eyes_tpu.ops import hamming


def test_probe_returns_sane_economics(monkeypatch):
    monkeypatch.setattr(hamming, "_CROSSOVER_PROBE", None)
    out = hamming.probe_crossover(n_probe=2000)
    assert 4096 <= out["derived_host_scan_max"] <= 1 << 22
    assert out["host_s_per_item"] > 0
    assert out["upload_mb_per_s"] > 0
    # cached on second call (identity, not just equality)
    assert hamming.probe_crossover() is out


def test_env_probe_routes_scanner(monkeypatch):
    monkeypatch.setattr(hamming, "_CROSSOVER_PROBE", None)
    monkeypatch.setenv("KET_DUP_HOST_SCAN_MAX", "probe")
    s = hamming.BandedHammingScanner()
    assert s.host_scan_max == hamming.probe_crossover()["derived_host_scan_max"]


def test_env_static_still_respected(monkeypatch):
    monkeypatch.setenv("KET_DUP_HOST_SCAN_MAX", "12345")
    s = hamming.BandedHammingScanner()
    assert s.host_scan_max == 12345


def test_probe_does_not_perturb_scan_results(monkeypatch):
    monkeypatch.setattr(hamming, "_CROSSOVER_PROBE", None)
    rng = np.random.default_rng(5)
    ph = rng.integers(0, 1 << 63, size=3000).astype(np.uint64)
    before = hamming.host_window_scan(
        ph, band_bits=16, band_count=4, hamming_threshold=8
    )
    hamming.probe_crossover(n_probe=2000)
    after = hamming.host_window_scan(
        ph, band_bits=16, band_count=4, hamming_threshold=8
    )
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
