"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; real-TPU tests are marked ``tpu`` and excluded by default).
"""

from __future__ import annotations

import os

# Must be set before any jax backend initializes in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon site hook (PYTHONPATH=/root/.axon_site) imports jax at interpreter
# start and pins JAX_PLATFORMS=axon (the single tunneled TPU).  Tests must run
# on the 8-virtual-device CPU mesh regardless, so override via jax.config —
# this works as long as no backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(autouse=True)
def _no_quiesce_leak():
    """Fail any test that leaks the quiesce gate (reference
    tests/conftest.py:17-26 discipline)."""
    from kobato_eyes_tpu.db import connection

    assert not connection.is_quiesced(), "quiesce leaked from a previous test"
    yield
    leaked = connection.is_quiesced()
    if leaked:
        connection.end_quiesce()
    assert not leaked, "test leaked the quiesce gate"


@pytest.fixture
def rng() -> np.random.Generator:
    # function-scoped on purpose: a session-scoped generator is consumed in
    # test order, so adding any rng-using test silently shifts the data every
    # later test sees (found as an order-dependent SSIM threshold flake)
    return np.random.default_rng(0)


def make_rgb_image(rng: np.random.Generator, width: int = 64, height: int = 48) -> Image.Image:
    arr = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return Image.fromarray(arr, "RGB")


@pytest.fixture
def sample_images(rng) -> list[Image.Image]:
    """A small set of random RGB images of varying sizes."""
    sizes = [(64, 48), (128, 128), (33, 77), (256, 100), (448, 448)]
    return [make_rgb_image(rng, w, h) for (w, h) in sizes]


@pytest.fixture
def image_dir(tmp_path, rng):
    """Directory with a handful of saved images (png/jpg) for scanner tests."""
    paths = []
    for i, (w, h) in enumerate([(64, 48), (80, 80), (120, 60)]):
        img = make_rgb_image(rng, w, h)
        p = tmp_path / f"img_{i}.png"
        img.save(p)
        paths.append(p)
    jpg = tmp_path / "img_3.jpg"
    make_rgb_image(rng, 90, 90).save(jpg, quality=95)
    paths.append(jpg)
    return tmp_path, paths
