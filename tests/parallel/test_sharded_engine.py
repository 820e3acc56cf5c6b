"""Multi-chip dup engine: mesh-sharded scan == single-chip clusters.

Integration of parallel/sharded_scan.py into the engine surface: passing a
mesh to TpuDuplicateScanner shards the windowed candidate compare over the
data axis while keeping the full cluster-identity contract (asserted against
both the single-chip engine and the reference-shaped CPU scanner).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


def _files(rng, n):
    n_dups = n // 3
    orig = rng.integers(0, 1 << 64, size=n - n_dups, dtype=np.uint64)
    dups = orig[rng.integers(0, len(orig), size=n_dups)].copy()
    for i in range(n_dups):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 6))):
            dups[i] ^= np.uint64(1) << np.uint64(bit)
    h = np.concatenate([orig, dups])
    rng.shuffle(h)
    sizes = rng.integers(10_000, 5_000_000, size=n)
    from kobato_eyes_tpu.dup.types import DuplicateFileMeta

    return [
        DuplicateFileMeta(
            file_id=i, path=Path(f"/m/{i:05d}.png"), size=int(sizes[i]),
            width=None, height=None, phash=int(h[i]),
        )
        for i in range(n)
    ]


def test_mesh_scanner_cluster_identity():
    from kobato_eyes_tpu.dup.cpu_ref import CpuDuplicateScanner
    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateScanConfig
    from kobato_eyes_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(17)
    files = _files(rng, 900)
    cfg = DuplicateScanConfig(hamming_threshold=8, size_ratio=0.5)
    mesh = make_mesh(data=8, model=1)
    sharded = TpuDuplicateScanner(cfg, mesh=mesh).build_clusters(files)
    solo = TpuDuplicateScanner(cfg).build_clusters(files)
    cpu = CpuDuplicateScanner(cfg).build_clusters(files)
    assert cluster_ids(sharded) == cluster_ids(solo) == cluster_ids(cpu)


def test_mesh_scanner_with_pair_cap():
    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateScanConfig
    from kobato_eyes_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(23)
    files = _files(rng, 600)
    # a dense bucket: many copies of one hash exercise the cap mask + the
    # overflow-retry loop (tiny starting cap)
    for f in files[:80]:
        object.__setattr__(f, "phash", files[0].phash)
    cfg = DuplicateScanConfig(hamming_threshold=6, bucket_pair_cap=500)
    mesh = make_mesh(data=8, model=1)
    sharded = TpuDuplicateScanner(cfg, mesh=mesh)
    sharded._scanner.max_edges_hint = 1 << 8  # force at least one retry
    a = sharded.build_clusters(files)
    b = TpuDuplicateScanner(cfg).build_clusters(files)
    assert cluster_ids(a) == cluster_ids(b)


def test_mesh_scanner_oversized_run_falls_back():
    """A bucket run beyond max_window must not blow up the sharded kernel's
    (bands, window, rows/shard) intermediates — the scan falls back to the
    single-chip path and keeps cluster identity."""
    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateScanConfig
    from kobato_eyes_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(31)
    files = _files(rng, 500)
    for f in files[:120]:  # run of 120 identical hashes
        object.__setattr__(f, "phash", files[0].phash)
    cfg = DuplicateScanConfig(hamming_threshold=4)
    mesh = make_mesh(data=8, model=1)
    sharded = TpuDuplicateScanner(cfg, mesh=mesh)
    sharded._scanner.max_window = 64  # force run > max_window
    a = sharded.build_clusters(files)
    b = TpuDuplicateScanner(cfg).build_clusters(files)
    assert cluster_ids(a) == cluster_ids(b)
