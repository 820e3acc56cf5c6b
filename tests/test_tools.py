"""Tool-layer tests: calibration math, model inspection, db admin."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from calibrate import auc, average_precision, calibrate, roc_curve, youden_threshold  # noqa: E402

from kobato_eyes_tpu.db.admin import list_backups, reset_database
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.models.inspection import detect_family, inspect_model
from kobato_eyes_tpu.models.labels import TagMeta, synthetic_labels
from kobato_eyes_tpu.models.base import TagCategory


def test_roc_perfect_separation():
    labels = np.array([0, 0, 0, 1, 1, 1])
    scores = np.array([0.1, 0.2, 0.3, 0.8, 0.9, 0.95])
    fpr, tpr, _ = roc_curve(labels, scores)
    assert auc(fpr, tpr) == pytest.approx(1.0)
    assert average_precision(labels, scores) == pytest.approx(1.0)
    thr, j = youden_threshold(labels, scores)
    assert j == pytest.approx(1.0)
    assert 0.3 < thr <= 0.8


def test_roc_random_is_half():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 2000)
    scores = rng.uniform(size=2000)
    fpr, tpr, _ = roc_curve(labels, scores)
    assert auc(fpr, tpr) == pytest.approx(0.5, abs=0.05)


def test_calibrate_rows():
    rows = [
        {"label": "1", "ssim": "0.95", "structural": "0.9"},
        {"label": "1", "ssim": "0.92", "structural": "0.8"},
        {"label": "0", "ssim": "0.40", "structural": "0.2"},
        {"label": "0", "ssim": "0.55", "structural": "0.3"},
    ]
    out = calibrate(rows, ["ssim", "structural"])
    assert out["ssim"]["auc"] == 1.0
    assert 0.55 < out["ssim"]["suggested_threshold"] <= 0.92


def test_detect_family():
    assert detect_family(synthetic_labels(8000)) == "wd14"
    assert detect_family(synthetic_labels(13461)) == "pixai"
    assert detect_family([TagMeta("a", TagCategory.CHARACTER, ips=("b",))]) == "pixai"
    assert detect_family(synthetic_labels(100)) == "unknown"


def test_inspect_model_with_csv(tmp_path):
    ckpt = tmp_path / "model.ckpt"
    ckpt.touch()
    (tmp_path / "selected_tags.csv").write_text(
        "name,category,count\n" + "\n".join(f"t{i},general,1" for i in range(8000)) + "\n"
    )
    info = inspect_model(checkpoint_path=ckpt)
    assert info.family == "wd14"
    assert info.label_count == 8000
    assert "labels discovered" in info.notes[0]
    assert "family: wd14" in info.summary()


def test_reset_database_backs_up(tmp_path):
    reset_bootstrap_cache()
    db = tmp_path / "c.sqlite"
    bootstrap(db).close()
    assert db.exists()
    backups = reset_database(db)
    assert not db.exists()
    assert backups and backups[0].exists()
    assert list_backups(db) == backups
    # fresh bootstrap after reset works
    bootstrap(db).close()
    assert db.exists()


# --- tools/migrate_data.py ------------------------------------------------

def _paths(tmp_path):
    from kobato_eyes_tpu.utils.paths import get_app_paths

    return get_app_paths(tmp_path / "data")


def test_migrate_flat_db_moves_side_files(tmp_path):
    from migrate_data import migrate_all, migrate_flat_db

    paths = _paths(tmp_path)
    paths.root.mkdir(parents=True)
    (paths.root / "catalog.sqlite3").write_bytes(b"db")
    (paths.root / "catalog.sqlite3-wal").write_bytes(b"wal")
    assert migrate_flat_db(paths)
    assert paths.db_path.read_bytes() == b"db"
    assert (paths.db_path.parent / "catalog.sqlite3-wal").read_bytes() == b"wal"
    assert not (paths.root / "catalog.sqlite3").exists()
    # idempotent
    assert not migrate_all(paths)


def test_migrate_flat_db_refuses_overwrite(tmp_path):
    from migrate_data import migrate_flat_db

    paths = _paths(tmp_path)
    paths.ensure()
    paths.db_path.write_bytes(b"current")
    (paths.root / "catalog.sqlite3").write_bytes(b"legacy")
    assert not migrate_flat_db(paths)
    assert paths.db_path.read_bytes() == b"current"


def test_migrate_legacy_home_relocates(tmp_path):
    from migrate_data import migrate_legacy_home

    paths = _paths(tmp_path)
    legacy = tmp_path / "old-home"
    (legacy / "db").mkdir(parents=True)
    (legacy / "db" / "catalog.sqlite3").write_bytes(b"old")
    assert migrate_legacy_home(paths, legacy=legacy)
    assert paths.db_path.read_bytes() == b"old"
    assert not legacy.exists()


def test_migrate_legacy_home_keeps_existing_data(tmp_path):
    from migrate_data import migrate_legacy_home

    paths = _paths(tmp_path)
    paths.ensure()
    paths.db_path.write_bytes(b"current")
    legacy = tmp_path / "old-home"
    legacy.mkdir()
    (legacy / "anything").write_text("x")
    assert not migrate_legacy_home(paths, legacy=legacy)
    assert legacy.exists()


# --- tools/find_magic_numbers.py -------------------------------------------

def test_magic_number_lint_flags_and_allows(tmp_path):
    from find_magic_numbers import scan_file

    src = tmp_path / "m.py"
    src.write_text(
        "LIMIT = 900\n"                      # module constant: allowed
        "x = 37\n"                            # flagged
        "y = x + 1\n"                         # 1 allowed
        "z = 0.5\n"                           # allowed float
        "tol = 1e-6\n"                        # scientific: allowed
        "cap = 4096  # noqa: magic\n"         # suppressed
        "if x > 17:\n    pass\n"              # flagged comparison
    )
    found = scan_file(src)
    values = sorted(v for _, v in found)
    assert values == [17, 37]


def test_magic_number_lint_handles_annassign_constants(tmp_path):
    from find_magic_numbers import scan_file

    src = tmp_path / "m.py"
    src.write_text("WINDOW: int = 256\nBANDS = (16, 4)\n")
    assert scan_file(src) == []


def test_inspect_model_onnx_summary(tmp_path):
    """inspect_model summarizes .onnx weights via the dependency-free reader."""
    import numpy as np

    from kobato_eyes_tpu.models.inspection import inspect_model
    from kobato_eyes_tpu.models.onnx_import import write_onnx_initializers

    p = tmp_path / "model.onnx"
    write_onnx_initializers(
        p, {"a": np.zeros((10, 10), np.float32), "b": np.zeros(5, np.float32)}
    )
    info = inspect_model(checkpoint_path=p)
    assert any("2 initializers" in n and "ket import-weights" in n for n in info.notes)
    # junk file: tolerant note, not an exception
    bad = tmp_path / "junk.onnx"
    bad.write_bytes(b"nope")
    info2 = inspect_model(checkpoint_path=bad)
    assert any("unreadable" in n for n in info2.notes)
