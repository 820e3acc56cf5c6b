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
