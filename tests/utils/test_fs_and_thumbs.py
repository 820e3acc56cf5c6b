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


def test_trash_manifest_skips_misshaped_lines(tmp_path):
    """Valid-JSON-but-wrong-shape lines are skipped like corrupt ones — the
    'never fatal' contract covers schema, not just syntax."""
    from kobato_eyes_tpu.utils.fs import append_trash_record, load_trash_records

    append_trash_record(tmp_path, file_id=1, original="/a/x.png", trashed="/t/x.png")
    with open(tmp_path / "trash.jsonl", "a") as fh:
        fh.write("null\n")
        fh.write('{"foo": 1}\n')
        fh.write('{"file_id": "not-int", "original": "/a", "trashed": "/t"}\n')
        fh.write("{broken json\n")
    recs = load_trash_records(tmp_path)
    assert len(recs) == 1 and recs[0]["file_id"] == 1


def test_remove_trash_records_preserves_concurrent_appends(tmp_path):
    from kobato_eyes_tpu.utils.fs import (
        append_trash_record,
        load_trash_records,
        remove_trash_records,
    )

    append_trash_record(tmp_path, file_id=1, original="/a/1", trashed="/t/1")
    append_trash_record(tmp_path, file_id=2, original="/a/2", trashed="/t/2")
    # record 3 lands "concurrently" (after the caller's load, before rewrite):
    # remove re-reads under the lock, so it must survive
    append_trash_record(tmp_path, file_id=3, original="/a/3", trashed="/t/3")
    remove_trash_records(tmp_path, {"/t/1"})
    left = {r["file_id"] for r in load_trash_records(tmp_path)}
    assert left == {2, 3}
