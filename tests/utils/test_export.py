"""Copy-results export semantics (reference "Copy results…" parity).

Pins the reference behaviors: timestamped per-query folder names with
folder-safe sanitization, ``_2``/``_3``… collision suffixes, ``copy2``
content fidelity, missing sources counted as failures without aborting,
and cancellation between files (``src/ui/tags_db.py:36-126``,
``src/utils/search_export.py``, ``src/ui/tags_workers.py:112-124``).
"""

from __future__ import annotations

from kobato_eyes_tpu.utils.export import (
    copy_results,
    make_export_dir,
    sanitize_for_folder,
    unique_destination,
)


def test_sanitize_for_folder():
    assert sanitize_for_folder('a/b\\c:d*e?f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"
    assert sanitize_for_folder("  blue   eyes  ") == "blue_eyes"
    assert sanitize_for_folder("") == "query"
    assert sanitize_for_folder("///") == "_"
    assert len(sanitize_for_folder("x" * 200)) == 60


def test_make_export_dir_creates_named_folder(tmp_path):
    dest = make_export_dir("1girl (blue_eyes | red_eyes)", tmp_path / "sr")
    assert dest.is_dir()
    assert dest.parent == tmp_path / "sr"
    # <timestamp>-<sanitized query>
    ts, _, rest = dest.name.partition("-")
    assert ts.isdigit() and len(ts) == 8
    # '|' is folder-reserved -> '_', then spaces join with '_'
    assert rest.endswith("1girl_(blue_eyes___red_eyes)")


def test_unique_destination_suffixes(tmp_path):
    (tmp_path / "a.png").write_bytes(b"one")
    (tmp_path / "a_2.png").write_bytes(b"two")
    assert unique_destination(tmp_path, "a.png").name == "a_3.png"
    assert unique_destination(tmp_path, "b.png").name == "b.png"


def test_copy_results_collisions_and_failures(tmp_path):
    src1 = tmp_path / "d1" / "img.png"
    src2 = tmp_path / "d2" / "img.png"  # same basename, different content
    src1.parent.mkdir()
    src2.parent.mkdir()
    src1.write_bytes(b"AAAA")
    src2.write_bytes(b"BBBB")
    missing = tmp_path / "gone.png"
    dest = tmp_path / "out"
    seen: list[tuple[int, int]] = []
    ok, failed = copy_results(
        [src1, src2, missing], dest, on_progress=lambda d, t: seen.append((d, t))
    )
    assert (ok, failed) == (2, 1)
    assert (dest / "img.png").read_bytes() == b"AAAA"
    assert (dest / "img_2.png").read_bytes() == b"BBBB"
    assert seen == [(1, 3), (2, 3), (3, 3)]


def test_copy_results_cancellation(tmp_path):
    srcs = []
    for i in range(4):
        p = tmp_path / f"s{i}.png"
        p.write_bytes(bytes([i]))
        srcs.append(p)
    dest = tmp_path / "out"
    copied = iter([False, False, True, True])  # cancel after 2 files
    ok, failed = copy_results(srcs, dest, is_cancelled=lambda: next(copied))
    assert (ok, failed) == (2, 0)
    assert len(list(dest.iterdir())) == 2
