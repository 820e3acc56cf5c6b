"""Property-based fuzz parity: TPU dup engine vs the CPU reference spec.

Hypothesis drives random hash populations (with planted near-dup structure),
pathological metadata (None sizes/dims, keeper-key ties, shared paths) and
the full config surface (thresholds, band layouts, size/cosine filters,
bucket caps) through both scanners; cluster identity — ids, keeper, member
order, best-hamming — must match exactly on every example.

Adversarial-breadth companion to tests/dup/test_engine_parity.py's
hand-picked configs (reference analog: tests/dup/test_scanner.py's
hand-built DuplicateFile cases; this sweeps the space instead).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from hypothesis import HealthCheck, given, settings

# soak knob: KET_FUZZ_SCALE=20 multiplies every max_examples (relay-down bug hunts, CI soak jobs)
import os as _os
try:
    _FUZZ_SCALE = max(1, int(_os.environ.get("KET_FUZZ_SCALE", "1")))
except ValueError:
    _FUZZ_SCALE = 1  # env policy: bad values degrade to defaults, never raise
from hypothesis import strategies as st

from kobato_eyes_tpu.dup.cpu_ref import CpuDuplicateScanner
from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner
from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig

from tests.dup.test_engine_parity import assert_clusters_equal

# Fixed population size: edge_scan jit-caches per (n, block) — one compile
# for the whole fuzz run keeps examples fast on the CPU backend.
N = 48

EXTS = [".png", ".jpg", ".webp", ".gif", ".jfif", ""]


@st.composite
def metas(draw) -> list[DuplicateFileMeta]:
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    hashes = rng.integers(0, 1 << 63, size=N, dtype=np.int64).astype(np.uint64)
    hashes |= rng.integers(0, 2, size=N).astype(np.uint64) << np.uint64(63)
    # plant near-dup structure: each planted row copies an earlier row with
    # 0..12 bit flips (0 = exact duplicate hash)
    n_planted = draw(st.integers(0, N - 1))
    for _ in range(n_planted):
        src, dst = rng.integers(0, N, size=2)
        h = hashes[src]
        for bit in rng.choice(64, size=rng.integers(0, 13), replace=False):
            h ^= np.uint64(1) << np.uint64(bit)
        hashes[dst] = h
    same_size = draw(st.booleans())  # force keeper-key ties through size
    none_dims = draw(st.booleans())
    shared_dir = draw(st.booleans())
    use_embed = draw(st.booleans())
    files = []
    for i in range(N):
        size = 4096 if same_size else int(rng.integers(0, 10_000_000))
        if rng.random() < 0.1:
            size = None  # type: ignore[assignment]
        w = h_ = None
        if not none_dims:
            w, h_ = int(rng.integers(1, 5000)), int(rng.integers(1, 5000))
        d = "/data" if shared_dir else f"/data/{i % 5}"
        emb = None
        if use_embed:
            emb = tuple(float(x) for x in rng.normal(size=8))
        files.append(
            DuplicateFileMeta(
                file_id=int(rng.integers(1, 1 << 31)) if draw(st.booleans()) else i + 1,
                path=Path(f"{d}/f{i:03d}{EXTS[i % len(EXTS)]}"),
                size=size,
                width=w,
                height=h_,
                phash=int(hashes[i]),
                embedding=emb,
            )
        )
    # file_id collisions are dropped by the engine pre-pass; keep ids unique
    # so the parity contract (not the dedup policy) is what's under test
    seen: set[int] = set()
    uniq = []
    for f in files:
        if f.file_id not in seen:
            seen.add(f.file_id)
            uniq.append(f)
    return uniq


@st.composite
def configs(draw) -> DuplicateScanConfig:
    band_bits, band_count = draw(
        st.sampled_from([(16, 4), (8, 8), (8, 4), (32, 2), (4, 16), (16, 2)])
    )
    return DuplicateScanConfig(
        hamming_threshold=draw(st.integers(0, 16)),
        size_ratio=draw(st.sampled_from([None, 0.25, 0.5, 0.9, 1.0])),
        band_bits=band_bits,
        band_count=band_count,
        cosine_threshold=draw(st.sampled_from([None, -1.0, 0.0, 0.7])),
        bucket_pair_cap=draw(st.sampled_from([None, 1, 10, 1000])),
    )


@settings(
    max_examples=40 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(files=metas(), cfg=configs())
def test_fuzz_cluster_identity(files, cfg):
    got = TpuDuplicateScanner(cfg).build_clusters(files)
    want = CpuDuplicateScanner(cfg).build_clusters(files)
    assert_clusters_equal(got, want)


@settings(max_examples=15 * _FUZZ_SCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(files=metas(), seed=st.integers(0, 2**16))
def test_fuzz_sweep_matches_individual_scans(files, seed):
    """Sweep = per-threshold scans on arbitrary populations, default bands."""
    rng = np.random.default_rng(seed)
    thresholds = sorted(set(int(t) for t in rng.integers(0, 13, size=3)))
    sweep = TpuDuplicateScanner(DuplicateScanConfig()).build_clusters_sweep(
        files, thresholds=thresholds
    )
    for t in thresholds:
        single = TpuDuplicateScanner(
            DuplicateScanConfig(hamming_threshold=t)
        ).build_clusters(files)
        assert_clusters_equal(sweep[t], single)


def test_delta_rescan_matches_fresh_engine(rng):
    """Warm engine + changed snapshot (the identity-delta path): clusters
    must equal a fresh engine's scan of the same snapshot — prep patching,
    column-cache partial hits, and rank maintenance all exact."""
    import dataclasses
    from pathlib import Path

    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig

    n = 300
    hashes = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    hashes[: n // 3] = hashes[0] ^ np.uint64(1)  # planted cluster
    files = [
        DuplicateFileMeta(
            file_id=i, path=Path(f"/lib/img_{i:04d}.png"), size=int(1000 + i),
            width=None, height=None, phash=int(hashes[i]),
        )
        for i in range(n)
    ]
    cfg = DuplicateScanConfig(hamming_threshold=8)
    warm = TpuDuplicateScanner(cfg)
    warm.build_clusters(files, files_token=("t", 0))

    # delta 1: flip one hash (same path -> no re-rank)
    files_b = list(files)
    files_b[5] = dataclasses.replace(files_b[5], phash=int(hashes[0]))
    got = warm.build_clusters(files_b, files_token=("t", 1))
    want = TpuDuplicateScanner(cfg).build_clusters(files_b)
    assert cluster_ids(got) == cluster_ids(want)

    # delta 2: replace a file entirely (new id, new path -> rank re-merge)
    files_c = list(files_b)
    files_c[7] = DuplicateFileMeta(
        file_id=n + 99, path=Path("/lib/aaa_new.jpg"), size=7,
        width=10, height=10, phash=int(hashes[0]),
    )
    got = warm.build_clusters(files_c, files_token=("t", 2))
    want = TpuDuplicateScanner(cfg).build_clusters(files_c)
    assert cluster_ids(got) == cluster_ids(want)

    # delta 3: back to the original snapshot (cache rows must self-heal)
    got = warm.build_clusters(files, files_token=("t", 3))
    want = TpuDuplicateScanner(cfg).build_clusters(files)
    assert cluster_ids(got) == cluster_ids(want)
