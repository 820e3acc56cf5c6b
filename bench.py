"""Headline benchmark: dup-scan throughput at 70k images (BASELINE.json #2).

Prints ONE JSON line::

    {"metric": "dup_scan_pairs_per_sec_70k", "value": N, "unit": "pairs/s",
     "vs_baseline": R}

``value`` is the warm-engine NON-memoized scan rate (total pair space / wall
time): the engine and XLA caches are warm, but one hash is flipped between
timed runs so the snapshot token changes and the full pipeline — columnar
prep, device candidate scan, edge extraction, DSU cluster assembly — executes
every iteration.  That makes it apples-to-apples with the CPU baseline, which
pays full prep+assembly every run.  The memoized steady-state re-scan
(unchanged snapshot: assembly memo hit) is reported separately as
``warm_memo_pairs_per_sec``, the cold first-scan as ``cold_scan_s``, and the
device-dispatch-only rate as ``device_dispatch_pairs_per_sec``.

``vs_baseline`` is value / the CPU reference implementation's rate
(dup/cpu_ref.py — a faithful re-implementation of the reference's bucketed
Python pair loops, src/dup/scanner.py:203-356) on the *same* hashes, with a
cluster-identity assertion so speed never comes at the cost of parity.

The CPU baseline is measured on a subsample and scaled by measured per-pair /
per-item costs only if the full run would exceed the time budget; by default
both sides run the full 70k.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

N_IMAGES = int(os.environ.get("KET_BENCH_N", "70000"))
SEED = 1234
HAMMING_THRESHOLD = 8
DUP_FRACTION = 0.3  # fraction of images that are near-dups of an original
CPU_BUDGET_S = float(os.environ.get("KET_BENCH_CPU_BUDGET_S", "600"))


def synth_hashes(n: int, seed: int) -> np.ndarray:
    """Synthetic pHash population with planted near-duplicate clusters."""
    rng = np.random.default_rng(seed)
    n_dups = int(n * DUP_FRACTION)
    n_orig = n - n_dups
    originals = rng.integers(0, 1 << 64, size=n_orig, dtype=np.uint64)
    # each dup flips 0..6 random bits of a random original
    src = rng.integers(0, n_orig, size=n_dups)
    dups = originals[src].copy()
    for i in range(n_dups):
        k = int(rng.integers(0, 7))
        for bit in rng.integers(0, 64, size=k):
            dups[i] ^= np.uint64(1) << np.uint64(bit)
    out = np.concatenate([originals, dups])
    rng.shuffle(out)
    return out


def main() -> None:
    from kobato_eyes_tpu.dup.cpu_ref import CpuDuplicateScanner
    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig

    def cpu_build_clusters(fs, cfg):
        return CpuDuplicateScanner(cfg).build_clusters(fs)

    n = N_IMAGES
    hashes = synth_hashes(n, SEED)
    sizes = np.random.default_rng(SEED + 1).integers(10_000, 5_000_000, size=n)
    files = [
        DuplicateFileMeta(
            file_id=i, path=Path(f"/bench/img_{i:07d}.png"), size=int(sizes[i]),
            width=None, height=None, phash=int(hashes[i]),
        )
        for i in range(n)
    ]
    config = DuplicateScanConfig(hamming_threshold=HAMMING_THRESHOLD)
    pair_space = n * (n - 1) / 2

    # --- device engine; warmup run at the SAME shapes so the timed run
    # excludes compilation (the reference bench likewise excludes its warmup
    # batch, tools/bench.py) ---
    from kobato_eyes_tpu.utils.metrics import metrics

    scanner = TpuDuplicateScanner(config, block=4096)
    token = ("bench", SEED, n)
    device_clusters = scanner.build_clusters(files, files_token=token)  # warmup/compile

    # --- HEADLINE: warm non-memoized scan.  A variant snapshot with ONE
    # flipped hash bit alternates with the real one, so every timed run sees
    # a changed token + changed edge set: columnar prep, device scan, and
    # full DSU assembly all execute (no memo hit) — the same work the CPU
    # baseline pays each run.  The engine object (and XLA compile cache)
    # stays warm, which is the honest production steady state.
    files_b = list(files)
    files_b[0] = dataclasses.replace(files_b[0], phash=int(hashes[0]) ^ 1)
    token_b = ("bench-b", SEED, n)
    # median of 3 timed runs: the tunnel VM's wall clock is noisy enough to
    # swing a single run by 30%+, which would make round-over-round numbers
    # meaningless
    # disjoint top-level phases (dup.scan.{upload,bucket_stats,device,expand}
    # and dup.assemble.* are children of dup.scan.call / dup.assemble)
    TOP_PHASES = ("dup.scan.prep", "dup.scan.call", "dup.assemble")
    runs: list[tuple[float, dict]] = []
    for _ in range(3):
        scanner.build_clusters(files_b, files_token=token_b)  # invalidate memo
        metrics.reset()
        t0 = time.perf_counter()
        device_clusters = scanner.build_clusters(files, files_token=token)
        elapsed = time.perf_counter() - t0
        runs.append((elapsed, {
            name: round(stats["total"], 4)
            for name, stats in metrics.snapshot()["timers"].items()
        }))
    runs.sort(key=lambda r: r[0])
    device_s, phase_report = runs[len(runs) // 2]
    device_s_min = runs[0][0]
    device_pps = pair_space / device_s
    # lane self-description (VERDICT r4 weak #2): which path produced the
    # headline, and the engine's routing constant, so the number is
    # interpretable off this box
    headline_path = (
        "host" if n <= scanner._scanner.host_scan_max else "device"
    )
    # phase accounting must explain the wall time: top-level phases are
    # disjoint (dup.assemble.* are children of dup.assemble), so their sum
    # plus a small residual (timer overhead, logging) should match wall
    top_sum = sum(phase_report.get(p, 0.0) for p in TOP_PHASES)
    residual = device_s - top_sum
    print(
        f"warm non-memo scan {device_s:.3f}s (median of 3), phases: {phase_report}; "
        f"top-phase sum {top_sum:.3f}s, residual {residual * 1e3:.1f}ms "
        f"({100 * residual / device_s:.1f}% of wall)",
        file=sys.stderr,
    )

    # --- attribution: the device bitmask kernel, measured on an EXPLICIT
    # device-path scanner.  At 70k the engine routes to the vectorized host
    # scan (transfers over the tunneled link cost more than the whole host
    # pass — ops/hamming.py host_window_scan); the device path is the
    # production route past the crossover (KET_DUP_HOST_SCAN_MAX), so its
    # kernel rate is reported for attribution and its clusters are asserted
    # identical to the host path's.
    from kobato_eyes_tpu.dup.engine import cluster_ids as _cluster_ids

    dev_scanner = TpuDuplicateScanner(config, block=4096, host_scan_max=0)
    dev_clusters = dev_scanner.build_clusters(files, files_token=token)  # compile+warm
    if _cluster_ids(dev_clusters) != _cluster_ids(device_clusters):
        raise SystemExit("device-path clusters != host-path clusters")
    dev_scanner.build_clusters(files_b, files_token=token_b)
    metrics.reset()
    t0 = time.perf_counter()
    dev_scanner.build_clusters(files, files_token=token)
    dev_wall = time.perf_counter() - t0
    dev_phases = {
        name: round(stats["total"], 4)
        for name, stats in metrics.snapshot()["timers"].items()
    }
    kernel_s = dev_phases.get("dup.scan.device", dev_wall)
    print(
        f"device-path scan {dev_wall:.3f}s (kernel dispatch {kernel_s:.3f}s = "
        f"{pair_space / kernel_s:.3g} pairs/s), phases: {dev_phases}",
        file=sys.stderr,
    )

    # --- secondary: memoized steady-state re-scan (unchanged snapshot; the
    # interactive slider workload — assembly memo hit, device scan still runs)
    memo_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        scanner.build_clusters(files, files_token=token)
        memo_times.append(time.perf_counter() - t0)
    memo_s = sorted(memo_times)[1]
    print(
        f"warm memoized re-scan {memo_s:.3f}s = {pair_space / memo_s:.3g} pairs/s",
        file=sys.stderr,
    )

    # Cold-path reference point (fresh engine, no snapshot caches; XLA
    # compile cache shared process-wide): what the FIRST scan of a new
    # catalog pays.  Reported for transparency next to the steady-state
    # headline — the interactive re-scan is the production workload.
    cold_scanner = TpuDuplicateScanner(config, block=4096)
    metrics.reset()
    t0 = time.perf_counter()
    cold_clusters = cold_scanner.build_clusters(files)
    cold_s = time.perf_counter() - t0
    cold_phases = {
        name: round(stats["total"], 4)
        for name, stats in metrics.snapshot()["timers"].items()
    }
    assert cluster_ids(cold_clusters) == cluster_ids(device_clusters)
    print(
        f"cold scan (fresh engine, compiled) {cold_s:.3f}s "
        f"= {pair_space / cold_s:.3g} pairs/s, phases: {cold_phases}",
        file=sys.stderr,
    )

    # --- CPU reference on the same data ---
    cpu_n = n
    est = None
    # Probe on 10k to estimate full cost; fall back to scaling if over budget.
    probe_n = min(10_000, n)
    cpu_scanner = CpuDuplicateScanner(config)
    t0 = time.perf_counter()
    cpu_scanner.build_clusters(files[:probe_n])
    probe_s = time.perf_counter() - t0
    est = probe_s * (n / probe_n) ** 2  # bucket pair work scales ~quadratically
    if est > CPU_BUDGET_S:
        cpu_pps = (probe_n * (probe_n - 1) / 2) / probe_s
        cpu_s_min = probe_s
        cpu_ref_phases = dict(cpu_scanner.last_phases)
        parity_files = files[:probe_n]
    else:
        cpu_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            cpu_clusters = cpu_scanner.build_clusters(files)
            cpu_times.append(time.perf_counter() - t0)
        cpu_s = sorted(cpu_times)[1]  # median of 3 (same rationale as device)
        cpu_s_min = min(cpu_times)
        cpu_pps = pair_space / cpu_s
        cpu_ref_phases = dict(cpu_scanner.last_phases)
        parity_files = None
        # cluster identity assertion (full run)
        assert cluster_ids(device_clusters) == cluster_ids(cpu_clusters), (
            "device clusters diverge from CPU reference"
        )
    if parity_files is not None:
        # parity asserted on the probe subset when the full CPU run is skipped
        sub_dev = scanner.build_clusters(parity_files)
        sub_cpu = cpu_build_clusters(parity_files, config)
        assert cluster_ids(sub_dev) == cluster_ids(sub_cpu), (
            "device clusters diverge from CPU reference (probe)"
        )

    # crossover provenance: what THIS host+link measures the host/device
    # routing constant to be (the engine's default is env-overridable and
    # can route differently on attached hardware — the JSON says which lane
    # produced `value` and what the link economics were at capture time)
    try:
        from kobato_eyes_tpu.ops.hamming import probe_crossover

        probe = probe_crossover()
        crossover = {
            "derived_host_scan_max": probe["derived_host_scan_max"],
            "upload_mb_per_s": round(probe["upload_mb_per_s"], 1),
            "device_rtt_ms": round(probe["device_rtt_s"] * 1e3, 2),
        }
    except Exception as exc:  # probe is provenance, never a bench failure
        crossover = {"error": str(exc)}

    print(
        json.dumps(
            {
                "metric": f"dup_scan_pairs_per_sec_{n // 1000}k",
                "value": round(device_pps, 1),
                "unit": "pairs/s",
                "vs_baseline": round(device_pps / cpu_pps, 2),
                # lane self-description + crossover provenance
                "headline_path": headline_path,
                "host_scan_max": scanner._scanner.host_scan_max,
                "crossover_probe": crossover,
                # min-wall aggregation alongside the median headline, both
                # sides, so a degraded-VM capture is diagnosable post-hoc
                "value_min_wall": round(pair_space / device_s_min, 1),
                # min-vs-min only when the CPU side ran the full population
                "vs_baseline_min_wall": (
                    round(cpu_s_min / device_s_min, 2)
                    if parity_files is None
                    else None
                ),
                "cpu_ref_min_wall_s": round(cpu_s_min, 3),
                "cpu_ref_phases": cpu_ref_phases,
                # attribution for relay-variance days: the same compiled
                # kernel's dispatch-only rate and the cold first-scan cost
                "warm_memo_pairs_per_sec": round(pair_space / memo_s, 1),
                "device_dispatch_pairs_per_sec": round(pair_space / kernel_s, 1),
                "cold_scan_s": round(cold_s, 3),
                "cpu_ref_pairs_per_sec": round(cpu_pps, 1),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
