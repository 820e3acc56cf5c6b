"""CLI dup --trash-duplicates: non-keepers trashed + marked absent."""

from __future__ import annotations

import shutil

import pytest

from kobato_eyes_tpu.cli import main
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.utils.paths import get_app_paths

pytestmark = pytest.mark.integration


def test_trash_duplicates(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    # make an exact duplicate of the first image (same pixels, new file)
    dup_path = root / "dup_of_0.png"
    shutil.copyfile(paths[0], dup_path)

    data_dir = tmp_path / "data"
    cfg = tmp_path / "settings.yaml"
    cfg.write_text(f"pipeline:\n  roots: [{root}]\ntagger:\n  name: dummy\n")
    base = ["--config", str(cfg), "--data-dir", str(data_dir)]

    assert main([*base, "index"]) == 0
    assert main([*base, "dup", "--hamming", "0", "--trash-duplicates"]) == 0

    # exactly one of (original, copy) survives on disk; the other is in trash
    survivors = [p for p in (paths[0], dup_path) if p.exists()]
    assert len(survivors) == 1
    trash = get_app_paths(data_dir).root / "trash"
    moved = [p for p in trash.iterdir() if not p.name.startswith("trash.jsonl")]
    assert len(moved) == 1
    # the manifest records the move so `ket trash --restore` can undo it
    from kobato_eyes_tpu.utils.fs import load_trash_records

    recs = load_trash_records(trash)
    assert len(recs) == 1 and recs[0]["trashed"] == str(moved[0])

    db = get_app_paths(data_dir).db_path
    conn = bootstrap(db)
    try:
        absent = conn.execute("SELECT COUNT(*) FROM files WHERE is_present=0").fetchone()[0]
        assert absent == 1
    finally:
        conn.close()


def test_trash_put_and_restore(tmp_path, image_dir, capsys):
    """ket trash --put: the app's delete-selected-results, reversible."""
    import json

    reset_bootstrap_cache()
    root, paths = image_dir
    data_dir = tmp_path / "data"
    cfg = tmp_path / "settings.yaml"
    cfg.write_text(f"pipeline:\n  roots: [{root}]\ntagger:\n  name: dummy\n")
    base = ["--config", str(cfg), "--data-dir", str(data_dir)]

    assert main([*base, "index"]) == 0
    capsys.readouterr()

    db = get_app_paths(data_dir).db_path
    conn = bootstrap(db)
    try:
        fid, fpath = conn.execute(
            "SELECT id, path FROM files ORDER BY id LIMIT 1"
        ).fetchone()
    finally:
        conn.close()

    # one valid id + one unknown id: per-file isolation, rc=1 on failures
    assert main([*base, "trash", "--put", str(fid), "999999"]) == 1
    report = json.loads(capsys.readouterr().out)
    assert report == {"trashed": [fid], "failed": [999999]}
    assert not __import__("pathlib").Path(fpath).exists()

    conn = bootstrap(db)
    try:
        present = conn.execute(
            "SELECT is_present FROM files WHERE id=?", (fid,)
        ).fetchone()[0]
        assert present == 0
    finally:
        conn.close()

    # reversible: restore puts the file back and re-marks present
    assert main([*base, "trash", "--restore", str(fid)]) == 0
    assert __import__("pathlib").Path(fpath).exists()
    conn = bootstrap(db)
    try:
        present = conn.execute(
            "SELECT is_present FROM files WHERE id=?", (fid,)
        ).fetchone()[0]
        assert present == 1
    finally:
        conn.close()
