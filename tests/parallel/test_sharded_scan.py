"""Row-sharded windowed scan vs the single-chip spec on the 8-dev CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest

import jax

from kobato_eyes_tpu.ops.hamming import band_keys_np, bucket_ok_np, edge_scan_np
from kobato_eyes_tpu.parallel.mesh import make_mesh
from kobato_eyes_tpu.parallel.sharded_scan import sharded_window_scan
from kobato_eyes_tpu.utils.bits import u64_to_u32pair

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


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


def test_sharded_scan_matches_spec(rng):
    n = 400
    ph = _population(rng, n)
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    pairs = u64_to_u32pair(ph)

    # per-band sort on host (same prep as the single-chip scanner)
    orders = np.stack([np.argsort(keys[:, b].astype(np.uint32), kind="stable") for b in range(4)])
    sk = np.take_along_axis(keys.T.astype(np.uint32), orders, axis=1)
    sph = pairs[orders]
    sok = np.take_along_axis(ok.T, orders, axis=1)

    # window >= max bucket run
    max_run = max(
        int(np.unique(keys[:, b], return_counts=True)[1].max()) for b in range(4)
    )
    window = max(8, max_run)

    mesh = make_mesh(data=8, model=1)
    b, i_s, j_s, d = sharded_window_scan(
        mesh, sk, sph, sok, hamming_threshold=8, window=window
    )
    # map back to original coordinates + dedup (same as single-chip path)
    gi = orders[b, i_s]
    gj = orders[b, j_s]
    lo = np.minimum(gi, gj)
    hi = np.maximum(gi, gj)
    key = lo * n + hi
    _, first = np.unique(key, return_index=True)
    got = {(int(lo[k]), int(hi[k]), int(d[k])) for k in first}

    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=8)
    want = {(int(a), int(b_), int(c)) for a, b_, c in zip(ni, nj, nd)}
    assert got == want
