"""Filesystem helpers and thumbnail cache."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.utils.fs import is_hidden, is_system_path, restore_from_trash, trash_file
from kobato_eyes_tpu.utils.image_io import generate_thumbnail


def test_system_path_guard():
    assert is_system_path("/etc/passwd")
    assert is_system_path("/usr/lib/python3")
    assert not is_system_path("/home/me/pics")
    with pytest.raises(ValueError):
        trash_file("/etc/passwd", trash_dir="/tmp/never")


def test_hidden_detection():
    assert is_hidden("/home/me/.cache/x.png")
    assert not is_hidden("/home/me/pics/x.png")


def test_trash_and_restore(tmp_path):
    f = tmp_path / "pic.png"
    f.write_bytes(b"data")
    trash = tmp_path / "trash"
    dest = trash_file(f, trash_dir=trash)
    assert dest is not None and dest.exists() and not f.exists()
    assert trash_file(f, trash_dir=trash) is None  # already gone
    restored = restore_from_trash(dest, f)
    assert restored == f and f.read_bytes() == b"data"


def test_thumbnail_cache(tmp_path, rng):
    img_path = tmp_path / "big.png"
    arr = rng.integers(0, 256, size=(600, 800, 3), dtype=np.uint8)
    Image.fromarray(arr, "RGB").save(img_path)
    cache = tmp_path / "cache"
    t1 = generate_thumbnail(img_path, cache_dir=cache, size=128)
    assert t1 is not None and t1.exists()
    with Image.open(t1) as thumb:
        assert max(thumb.size) <= 128
    mtime = t1.stat().st_mtime_ns
    t2 = generate_thumbnail(img_path, cache_dir=cache, size=128)
    assert t2 == t1 and t2.stat().st_mtime_ns == mtime  # cache hit, no rewrite

    # content change invalidates the key
    arr2 = rng.integers(0, 256, size=(500, 500, 3), dtype=np.uint8)
    Image.fromarray(arr2, "RGB").save(img_path)
    t3 = generate_thumbnail(img_path, cache_dir=cache, size=128)
    assert t3 is not None and t3 != t1


def test_thumbnail_failure_paths(tmp_path):
    missing = generate_thumbnail(tmp_path / "nope.png", cache_dir=tmp_path / "c")
    assert missing is None
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    assert generate_thumbnail(bad, cache_dir=tmp_path / "c") is None
