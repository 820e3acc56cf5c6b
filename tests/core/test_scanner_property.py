"""Property-based scanner semantics (reference tests/core/test_scanner_property.py).

Invariants over generated directory trees: only allowed extensions are
yielded, nothing under excluded subtrees or dot-directories appears, results
are unique and deterministic.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from kobato_eyes_tpu.core.scanner import iter_images

NAMES = st.text(alphabet=st.sampled_from("abcdef"), min_size=1, max_size=6)
EXTS = st.sampled_from([".png", ".jpg", ".txt", ".webp", ".bmp", ".doc"])


@st.composite
def tree_spec(draw):
    """A small tree: list of (dir_parts, filename) tuples."""
    n = draw(st.integers(1, 12))
    entries = []
    for _ in range(n):
        depth = draw(st.integers(0, 2))
        parts = tuple(draw(NAMES) for _ in range(depth))
        hidden = draw(st.booleans()) and depth > 0
        if hidden:
            parts = (("." + parts[0]),) + parts[1:]
        fname = draw(NAMES) + draw(EXTS)
        entries.append((parts, fname))
    return entries


@given(tree_spec())
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scanner_invariants(tmp_path_factory, entries):
    root = tmp_path_factory.mktemp("scan")
    for parts, fname in entries:
        d = root.joinpath(*parts)
        d.mkdir(parents=True, exist_ok=True)
        (d / fname).write_bytes(b"x")

    allow = [".png", ".jpg", ".webp", ".bmp"]
    results = list(iter_images([root], allow_exts=allow))
    paths = [r.path for r in results]

    # uniqueness + determinism
    assert len(paths) == len(set(paths))
    assert paths == [r.path for r in iter_images([root], allow_exts=allow)]

    for p in paths:
        assert p.suffix.lower() in allow
        rel = p.relative_to(root)
        assert not any(part.startswith(".") for part in rel.parts)

    # completeness: every allowed, non-hidden file is found
    expected = 0
    seen = set()
    for parts, fname in entries:
        key = (parts, fname)
        if key in seen:
            continue
        seen.add(key)
        if any(part.startswith(".") for part in parts):
            continue
        if not any(fname.endswith(e) for e in allow):
            continue
        expected += 1
    assert len(paths) == expected


def test_excluded_subtree(tmp_path):
    keep = tmp_path / "keep"
    skip = tmp_path / "skip"
    for d in (keep, skip):
        d.mkdir()
        (d / "img.png").write_bytes(b"x")
    results = list(iter_images([tmp_path], excluded=[skip]))
    assert [r.path.parent.name for r in results] == ["keep"]


def test_missing_root_and_broken_symlink_are_skipped(tmp_path):
    """Missing roots warn and yield nothing; a dangling symlink is a per-item
    stat failure, never fatal; duplicate roots dedupe."""
    from kobato_eyes_tpu.core.scanner import iter_images

    real = tmp_path / "lib"
    real.mkdir()
    (real / "ok.png").write_bytes(b"x")
    (real / "dangling.png").symlink_to(tmp_path / "nowhere.png")
    got = list(iter_images([real, tmp_path / "ghost", real]))
    assert [p.path.name for p in got] == ["ok.png"]


def test_hidden_and_excluded_pruned(tmp_path):
    from kobato_eyes_tpu.core.scanner import iter_images

    (tmp_path / ".hiddendir").mkdir()
    (tmp_path / ".hiddendir" / "a.png").write_bytes(b"x")
    (tmp_path / ".dotfile.png").write_bytes(b"x")
    (tmp_path / "skipme").mkdir()
    (tmp_path / "skipme" / "b.png").write_bytes(b"x")
    (tmp_path / "keep.png").write_bytes(b"x")
    got = list(iter_images([tmp_path], excluded=[tmp_path / "skipme"]))
    assert [p.path.name for p in got] == ["keep.png"]
