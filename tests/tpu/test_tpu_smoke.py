"""Real-TPU smoke tests (tpu-marked; excluded from the default suite).

Run with: pytest tests/tpu -m tpu --override-ini addopts=''
on a machine with an attached chip. Each test re-validates that a device
kernel compiles and agrees with its numpy spec on hardware (the default
suite runs everything on the CPU backend).
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    jax.config.update("jax_platforms", "")  # undo the conftest CPU pin
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        pytest.skip("no accelerator attached")
    return devs[0]


def test_phash_kernel_on_tpu(tpu_backend, rng):
    from kobato_eyes_tpu.ops.phash import phash_batch
    from kobato_eyes_tpu.utils.bits import u32pair_to_u64

    g32 = rng.uniform(0, 255, size=(8, 32, 32)).astype(np.float32)
    pairs = np.asarray(phash_batch(g32))
    assert u32pair_to_u64(pairs).shape == (8,)


def test_pallas_pairwise_on_tpu(tpu_backend, rng):
    from kobato_eyes_tpu.ops.pallas_hamming import pairwise_hamming, pairwise_hamming_np

    h = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    np.testing.assert_array_equal(
        pairwise_hamming(h, interpret=False), pairwise_hamming_np(h)
    )


def test_resident_scan_on_tpu(tpu_backend, rng):
    from kobato_eyes_tpu.ops.hamming import (
        BandedHammingScanner,
        band_keys_np,
        bucket_ok_np,
        edge_scan_np,
    )

    h = rng.integers(0, 1 << 64, size=2000, dtype=np.uint64)
    h[1000:] = h[:1000]  # plant exact duplicates
    got = BandedHammingScanner().scan(h, hamming_threshold=4)
    keys = band_keys_np(h, 16, 4)
    want = edge_scan_np(h, keys, bucket_ok_np(keys, None), hamming_threshold=4)
    assert {(a, b) for a, b in zip(got[0], got[1])} == {
        (a, b) for a, b in zip(want[0], want[1])
    }


def test_query_engine_on_tpu(tpu_backend, tmp_path):
    from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
    from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
    from kobato_eyes_tpu.query.engine import build_epoch, search_epoch

    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "t.sqlite")
    try:
        for i in range(50):
            fid = upsert_file(conn, path=f"/t/{i}.png", mtime=1e9 + i)
            tags = [("alpha", 0.9, 0)] if i % 2 == 0 else [("beta", 0.7, 0)]
            write_tagging_batch(conn, [TaggingItem(fid, tags)])
        epoch = build_epoch(conn)
    finally:
        conn.close()
    hits = search_epoch(epoch, "alpha -beta", order_by="id", limit=100)
    assert len(hits) == 25


def test_swin_forward_on_tpu(tpu_backend, rng):
    import jax.numpy as jnp
    import numpy as np

    from kobato_eyes_tpu.models.swin import SwinV2, init_swin_params, swin_config

    cfg = swin_config(
        "tiny", image_size=32, patch_size=4, window_size=4,
        embed_dim=32, depths=(2,), num_heads=(2,), num_classes=16,
    )
    params = init_swin_params(cfg)
    x = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)).astype(jnp.float32)
    logits = SwinV2(cfg).apply({"params": params}, x)
    assert logits.shape == (2, 16) and bool(jnp.isfinite(logits).all())


def test_threshold_sweep_on_tpu(tpu_backend, rng):
    """One device scan serves every slider value (the --sweep path)."""
    from pathlib import Path

    from kobato_eyes_tpu.dup.engine import TpuDuplicateScanner, cluster_ids
    from kobato_eyes_tpu.dup.types import DuplicateFileMeta, DuplicateScanConfig

    h = rng.integers(0, 1 << 64, size=600, dtype=np.uint64)
    h[300:] = h[:300]
    for i in range(300, 600):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 5))):
            h[i] ^= np.uint64(1) << np.uint64(bit)
    files = [
        DuplicateFileMeta(
            file_id=i, path=Path(f"/t/{i}.png"), size=1000 + i,
            width=None, height=None, phash=int(h[i]),
        )
        for i in range(600)
    ]
    scanner = TpuDuplicateScanner(DuplicateScanConfig(hamming_threshold=8))
    sweep = scanner.build_clusters_sweep(files, thresholds=[2, 4, 8])
    for thr in (2, 4, 8):
        solo = TpuDuplicateScanner(
            DuplicateScanConfig(hamming_threshold=thr)
        ).build_clusters(files)
        assert cluster_ids(sweep[thr]) == cluster_ids(solo)


def test_wide_window_past_old_packing_cap_on_tpu(tpu_backend, rng):
    """n > 2^20 on the wide-window path must produce CORRECT edges: the r3
    multi-plane bitmask kernel replaced the old 20-bit row packing (which
    this test used to assert raised at this scale) — rows past bit 20 must
    neither corrupt indices nor drop the planted bucket's pairs."""
    from kobato_eyes_tpu.ops.hamming import BandedHammingScanner

    n = (1 << 20) + 64
    h = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    h[:40] = h[0]  # one 40-deep bucket forces window > 32 (the wide path)
    # plant one exact pair ABOVE the old 2^20 cap: index corruption from any
    # packing regression would miss it or emit garbage indices
    hi = (1 << 20) + 11
    h[hi] = h[hi - 1]
    i, j, d = BandedHammingScanner().scan(h, hamming_threshold=0)
    pairs = set(zip(i.tolist(), j.tolist()))
    from itertools import combinations

    want_bucket = set(combinations(range(40), 2))
    assert want_bucket <= pairs, "planted 40-bucket pairs missing"
    assert (hi - 1, hi) in pairs, "pair above the old 2^20 cap missing"
    assert (d == 0).all()
    assert (np.asarray(i) < np.asarray(j)).all()


def test_epoch_delta_on_tpu(tpu_backend, tmp_path):
    """Incremental update_epoch equals a fresh build on hardware."""
    from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
    from kobato_eyes_tpu.db.repository import (
        TaggingItem,
        upsert_file,
        write_tagging_batch,
    )
    from kobato_eyes_tpu.query.engine import build_epoch, search_epoch, update_epoch

    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "d.sqlite")
    try:
        fids = []
        for i in range(60):
            fid = upsert_file(conn, path=f"/d/{i}.png", mtime=1e9 + i)
            write_tagging_batch(conn, [TaggingItem(fid, [("alpha", 0.9, 0)])])
            fids.append(fid)
        epoch = build_epoch(conn)
        # retag a third of the files and soft-delete two
        for fid in fids[:20]:
            write_tagging_batch(conn, [TaggingItem(fid, [("beta", 0.8, 0)])])
        conn.execute("UPDATE files SET is_present = 0 WHERE id IN (?, ?)", fids[20:22])
        conn.commit()
        delta = update_epoch(conn, epoch, changed_file_ids=fids[:22], version=1)
        fresh = build_epoch(conn, version=1)
    finally:
        conn.close()
    for q in ("alpha", "beta", "alpha -beta"):
        got = [r.file_id for r in search_epoch(delta, q, order_by="id", limit=100)]
        want = [r.file_id for r in search_epoch(fresh, q, order_by="id", limit=100)]
        assert got == want, q
    assert len(search_epoch(delta, "beta", order_by="id", limit=100)) == 20


def test_sharded_scan_on_tpu(tpu_backend, rng):
    """shard_map windowed scan on the hardware mesh (all attached chips)."""
    import jax

    from kobato_eyes_tpu.ops.hamming import band_keys_np, bucket_ok_np, edge_scan_np
    from kobato_eyes_tpu.parallel.mesh import make_mesh
    from kobato_eyes_tpu.parallel.sharded_scan import sharded_window_scan
    from kobato_eyes_tpu.utils.bits import u64_to_u32pair

    devs = [d for d in jax.devices() if d.platform != "cpu"]
    n = 256
    ph = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    ph[n // 2 :] = ph[: n // 2]
    keys = band_keys_np(ph, 16, 4)
    ok = bucket_ok_np(keys, None)
    pairs = u64_to_u32pair(ph)
    orders = np.stack(
        [np.argsort(keys[:, b].astype(np.uint32), kind="stable") for b in range(4)]
    )
    sk = np.take_along_axis(keys.T.astype(np.uint32), orders, axis=1)
    sph = pairs[orders]
    sok = np.take_along_axis(ok.T, orders, axis=1)
    max_run = max(
        int(np.unique(keys[:, b], return_counts=True)[1].max()) for b in range(4)
    )
    mesh = make_mesh(data=len(devs), model=1, devices=devs)
    b, i_s, j_s, d = sharded_window_scan(
        mesh, sk, sph, sok, hamming_threshold=6, window=max(8, max_run)
    )
    gi = orders[b, i_s]
    gj = orders[b, j_s]
    lo, hi = np.minimum(gi, gj), np.maximum(gi, gj)
    _, first = np.unique(lo * n + hi, return_index=True)
    got = {(int(lo[k]), int(hi[k]), int(d[k])) for k in first}
    ni, nj, nd = edge_scan_np(ph, keys, ok, hamming_threshold=6)
    assert got == {(int(a), int(c), int(e)) for a, c, e in zip(ni, nj, nd)}


def test_cluster_audit_on_tpu(tpu_backend, rng):
    """Production consumer of the Pallas pairwise kernel (ket dup --audit):
    hardware parity of the cohesion stats against the numpy spec."""
    from pathlib import Path

    from kobato_eyes_tpu.dup.audit import audit_clusters, audit_clusters_np
    from kobato_eyes_tpu.dup.types import (
        DuplicateCluster,
        DuplicateClusterEntry,
        DuplicateFileMeta,
    )

    clusters = []
    fid = 0
    for size in (3, 8, 40, 2):
        base = int(rng.integers(0, 1 << 63))
        entries = []
        for k in range(size):
            h = base
            for bit in rng.integers(0, 64, size=int(rng.integers(0, 6))):
                h ^= 1 << int(bit)
            entries.append(DuplicateClusterEntry(
                DuplicateFileMeta(fid + k, Path(f"/t/{fid + k}.png"), 1,
                                  None, None, h), None))
        clusters.append(DuplicateCluster(files=entries, keeper_id=fid))
        fid += size
    got = audit_clusters(clusters)
    want = audit_clusters_np(clusters)
    for g, w in zip(got, want):
        assert (g.size, g.diameter, g.keeper_max) == (w.size, w.diameter, w.keeper_max)
        assert abs(g.mean_distance - w.mean_distance) < 1e-9


def test_head_resident_attention_on_tpu(tpu_backend, rng):
    """The ViT fast path's Pallas attention: hardware parity vs einsum."""
    import jax
    import jax.numpy as jnp

    from kobato_eyes_tpu.ops.pallas_attention import (
        head_resident_attention_packed,
    )

    b, t, h, d = 2, 785, 4, 64
    qkv = jnp.asarray(rng.normal(size=(b, t, 3, h, d)).astype(np.float32), jnp.bfloat16)
    scale = d**-0.5
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    want = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(logits * scale, -1).astype(jnp.bfloat16), v
    )
    got = head_resident_attention_packed(qkv, scale=scale, interpret=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_windowed_cosine_attention_on_tpu(tpu_backend, rng):
    """SwinV2 fast path's Pallas window attention: hardware parity."""
    import jax
    import jax.numpy as jnp

    from kobato_eyes_tpu.ops.pallas_window_attention import (
        windowed_cosine_attention,
    )

    B, nW, n, H, hd = 2, 16, 196, 4, 32
    qkv = jnp.asarray(rng.normal(size=(B * nW, n, 3, H, hd)), jnp.bfloat16)
    scale = jnp.asarray(np.exp(rng.uniform(1.0, 2.0, H)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, n, n)).astype(np.float32))
    q = qkv[..., 0, :, :].astype(jnp.float32)
    k = qkv[..., 1, :, :].astype(jnp.float32)
    v = qkv[..., 2, :, :]
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qn, kn) * scale[None, :, None, None]
    attn = attn + bias[None]
    want = jnp.einsum(
        "bhnm,bmhd->bnhd", jax.nn.softmax(attn, -1).astype(jnp.bfloat16), v
    )
    got = windowed_cosine_attention(qkv, scale, bias, None, n_windows=nW, interpret=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )
