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
