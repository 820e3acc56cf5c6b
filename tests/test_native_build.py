"""Compile-on-first-use loader (native/build.py): build, cache, and failure paths.

The default suite otherwise only ever hits the warm cache (the real .so's are
prebuilt), leaving the compile/rebuild/error branches untested.
"""

from __future__ import annotations

import ctypes
import shutil
import time

import pytest

from kobato_eyes_tpu.native import build

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)

GOOD_SRC = 'extern "C" int forty_two(void) { return 42; }\n'


@pytest.fixture()
def native_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(build, "_NATIVE_DIR", tmp_path)
    monkeypatch.setattr(build, "_CACHE", {})
    return tmp_path


def test_builds_loads_and_caches(native_dir):
    (native_dir / "answer.cpp").write_text(GOOD_SRC)
    lib = build.load_native_library("answer")
    lib.forty_two.restype = ctypes.c_int
    assert lib.forty_two() == 42
    assert (native_dir / "_answer.so").exists()
    assert build.load_native_library("answer") is lib  # warm cache


def test_rebuilds_when_source_newer(native_dir):
    import os

    src = native_dir / "again.cpp"
    src.write_text(GOOD_SRC)
    build.load_native_library("again")
    so = native_dir / "_again.so"
    first_bytes = so.read_bytes()
    # a newer source must trigger a recompile on the next cold load.  (The
    # returned handle may still be the OLD mapping — dlopen caches by path
    # within a process — which is fine: production only rebuilds before the
    # first load of a fresh process.  Assert the artifact, not the reload.)
    build._CACHE.clear()
    src.write_text(GOOD_SRC.replace("42", "43"))
    os.utime(src, (time.time() + 5, time.time() + 5))
    build.load_native_library("again")
    assert so.read_bytes() != first_bytes


def test_missing_source_raises(native_dir):
    with pytest.raises(FileNotFoundError):
        build.load_native_library("does_not_exist")


def test_compile_failure_raises_with_stderr(native_dir):
    (native_dir / "broken.cpp").write_text("this is not C++\n")
    with pytest.raises(build.NativeBuildError) as ei:
        build.load_native_library("broken")
    assert "broken" in str(ei.value)
    assert not (native_dir / "_broken.so").exists()  # no half-built artifact


def test_extension_module_missing_source(native_dir):
    with pytest.raises(FileNotFoundError):
        build.load_extension_module("nope")
