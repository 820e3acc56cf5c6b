"""image_io failure policy: per-item skips, bomb cap, alpha matte, resize."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.utils.image_io import (
    generate_thumbnail,
    load_rgb_array,
    safe_load_image,
)


def test_pixel_cap_skips_oversized_image(tmp_path, caplog):
    p = tmp_path / "big.png"
    Image.new("RGB", (64, 64)).save(p)
    assert safe_load_image(p, max_pixels=16) is None  # 64*64 > 16 -> skip
    assert load_rgb_array(p, max_pixels=16) is None


def test_alpha_composites_over_white_before_anything(tmp_path):
    p = tmp_path / "half.png"
    rgba = Image.new("RGBA", (8, 8), (0, 0, 0, 0))  # fully transparent black
    rgba.putpixel((0, 0), (255, 0, 0, 255))  # one opaque red pixel
    rgba.save(p)
    img = safe_load_image(p)
    arr = np.asarray(img)
    assert img.mode == "RGB"
    assert tuple(arr[0, 0]) == (255, 0, 0)  # opaque pixel kept
    assert tuple(arr[4, 4]) == (255, 255, 255)  # transparent -> white matte


def test_max_side_downscales_preserving_aspect(tmp_path):
    p = tmp_path / "wide.png"
    Image.new("RGB", (100, 20)).save(p)
    img = safe_load_image(p, max_side=50)
    assert img.size == (50, 10)


def test_thumbnail_write_failure_returns_none(tmp_path, monkeypatch):
    src = tmp_path / "src.png"
    Image.new("RGB", (16, 16)).save(src)

    def boom(self, *a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(Image.Image, "save", boom)
    out = generate_thumbnail(src, cache_dir=tmp_path / "thumbs")
    assert out is None  # warned, not raised


def test_default_root_env_overrides(monkeypatch):
    from kobato_eyes_tpu.utils.paths import default_root

    monkeypatch.setenv("KET_DATA_DIR", "/custom/data")
    assert str(default_root()) == "/custom/data"
    monkeypatch.delenv("KET_DATA_DIR")
    monkeypatch.setenv("XDG_DATA_HOME", "/xdg")
    assert str(default_root()) == "/xdg/kobato-eyes-tpu"
    monkeypatch.delenv("XDG_DATA_HOME")
    assert default_root().name == "kobato-eyes-tpu"
