"""CLI smoke tests driving the full command surface with the dummy tagger."""

from __future__ import annotations

import json

import pytest

from kobato_eyes_tpu.cli import main
from kobato_eyes_tpu.db.connection import reset_bootstrap_cache

pytestmark = pytest.mark.integration


@pytest.fixture
def env(tmp_path, image_dir, monkeypatch):
    reset_bootstrap_cache()
    root, paths = image_dir
    data_dir = tmp_path / "data"
    cfg = tmp_path / "settings.yaml"
    cfg.write_text(
        "pipeline:\n"
        f"  roots: [{root}]\n"
        "  batch_size: 2\n"
        "  io_workers: 2\n"
        "tagger:\n"
        "  name: dummy\n"
    )
    return ["--config", str(cfg), "--data-dir", str(data_dir)], root, paths


def test_index_search_stats_complete(env, capsys):
    base, root, paths = env
    assert main([*base, "index"]) == 0
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["tagged"] == len(paths)

    assert main([*base, "search", "1girl", "--backend", "device"]) == 0
    assert len([l for l in capsys.readouterr().out.splitlines() if l.strip()]) == len(paths)

    # second device search hits the epoch snapshot (and returns the same rows)
    from kobato_eyes_tpu.utils.paths import get_app_paths

    snap = get_app_paths(base[3]).index_dir / "epoch.npz"
    assert snap.exists()
    assert main([*base, "search", "1girl", "--backend", "device"]) == 0
    assert len([l for l in capsys.readouterr().out.splitlines() if l.strip()]) == len(paths)

    assert main([*base, "search", "1girl", "--backend", "sql", "--limit", "2"]) == 0
    assert len(capsys.readouterr().out.splitlines()) == 2

    # multi-query: one process, one batched dispatch; per-query sections
    # match the single-query rows exactly on both backends
    assert main([*base, "search", "1girl", "1girl", "--backend", "device"]) == 0
    out_lines = capsys.readouterr().out.splitlines()
    assert out_lines.count("# query: 1girl") == 2
    rows = [l for l in out_lines if l.strip() and not l.startswith("# query:")]
    assert len(rows) == 2 * len(paths)
    assert rows[: len(paths)] == rows[len(paths):]

    assert main([*base, "search", "1girl", "1girl", "--backend", "sql", "--limit", "2"]) == 0
    sql_lines = [l for l in capsys.readouterr().out.splitlines() if not l.startswith("# query:")]
    assert len(sql_lines) == 4

    assert main([*base, "stats"]) == 0
    assert "1girl" in capsys.readouterr().out

    assert main([*base, "complete", "1g"]) == 0
    assert capsys.readouterr().out.startswith("1girl")


def test_search_copy_results(env, capsys, tmp_path):
    """'Copy results…' parity: the FULL hit set (not the displayed page) is
    copied; --copy-to targets an explicit dir, --copy derives a timestamped
    dir under the data dir's cache/search_results."""
    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()

    dest = tmp_path / "hits"
    # --limit 1 shows one row but the copy covers every hit (reference
    # re-enumerates the query at copy time, ui/tags_db.py:73-76)
    assert main([*base, "search", "1girl", "--backend", "device",
                 "--limit", "1", "--copy-to", str(dest)]) == 0
    capsys.readouterr()
    copied = sorted(p.name for p in dest.iterdir())
    assert copied == sorted(p.name for p in paths)

    # same-name collisions suffix instead of overwriting
    assert main([*base, "search", "1girl", "--backend", "sql",
                 "--copy-to", str(dest)]) == 0
    capsys.readouterr()
    assert len(list(dest.iterdir())) == 2 * len(paths)

    # multi-query --copy-to: per-query subfolders
    multi = tmp_path / "multi"
    assert main([*base, "search", "1girl", "1girl", "--backend", "device",
                 "--copy-to", str(multi)]) == 0
    capsys.readouterr()
    assert sorted(p.name for p in multi.iterdir()) == ["1girl"]
    assert len(list((multi / "1girl").iterdir())) == 2 * len(paths)

    # --copy: timestamped folder under <data>/cache/search_results
    assert main([*base, "search", "1girl", "--copy"]) == 0
    capsys.readouterr()
    from kobato_eyes_tpu.utils.paths import get_app_paths

    sr_root = get_app_paths(base[3]).cache_dir / "search_results"
    dirs = list(sr_root.iterdir())
    assert len(dirs) == 1 and dirs[0].name.endswith("-1girl")
    assert len(list(dirs[0].iterdir())) == len(paths)


def test_thresholds_roundtrip(env, capsys):
    base, _, _ = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    assert main([*base, "thresholds", "--set", "0=0.5"]) == 0
    assert json.loads(capsys.readouterr().out) == {"0": 0.5}


def test_dup_and_export(env, capsys, tmp_path):
    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    assert main([*base, "dup", "--hamming", "10"]) == 0
    # random images: clusters may or may not exist; command must succeed
    out_csv = tmp_path / "dups.csv"
    assert main([*base, "dup", "--hamming", "10", "--export", str(out_csv)]) == 0


def test_retag_flow(env, capsys):
    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    assert main([*base, "retag"]) == 0
    cleared = json.loads(capsys.readouterr().out)["cleared"]
    assert cleared == len(paths)


def test_config_show(env, capsys):
    base, _, _ = env
    assert main([*base, "config"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["tagger"]["name"] == "dummy"


def test_inspect_and_reset(env, capsys, tmp_path):
    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    (tmp_path / "selected_tags.csv").write_text(
        "name,category,count\n" + "\n".join(f"t{i},general,1" for i in range(8000)) + "\n"
    )
    assert main([*base, "inspect", "--labels", str(tmp_path / "selected_tags.csv")]) == 0
    out = capsys.readouterr().out
    assert "family: wd14" in out

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main([*base, "reset"])  # requires --yes
    assert main([*base, "reset", "--yes"]) == 0
    backups = json.loads(capsys.readouterr().out)["backups"]
    assert backups


def test_repl(env, capsys, monkeypatch):
    import io

    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    monkeypatch.setattr("sys.stdin", io.StringIO("1girl\n:reload\n1girl -missing\n:quit\n"))
    assert main([*base, "repl", "--limit", "100"]) == 0
    out = capsys.readouterr().out
    # both queries returned every dummy-tagged file
    assert out.count(".png") + out.count(".jpg") == 2 * len(paths)


def test_ann_build_and_query(tmp_path, image_dir, capsys):
    """The full ANN user journey at the CLI: embed during index (index.enabled),
    build the HNSW graph from stored embeddings, query by image."""
    reset_bootstrap_cache()
    root, paths = image_dir
    data_dir = tmp_path / "data"
    cfg = tmp_path / "settings.yaml"
    cfg.write_text(
        "pipeline:\n"
        f"  roots: [{root}]\n"
        "  batch_size: 2\n"
        "tagger:\n"
        "  name: dummy\n"
        "index:\n"
        "  enabled: true\n"
        "  preset: tiny\n"
        "  image_size: 64\n"
        "  patch_size: 16\n"
        "  embed_dim: 64\n"
    )
    base = ["--config", str(cfg), "--data-dir", str(data_dir)]
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    assert main([*base, "ann", "--build"]) == 0
    err_out = capsys.readouterr()
    assert main([*base, "ann", "--query-image", str(paths[0]), "--limit", "3"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 3
    # the query image itself must be its own nearest neighbor
    assert str(paths[0]) in lines[0]


def test_refresh_detects_new_and_missing(env, capsys, image_dir):
    """`ket refresh <root>`: tags files that appeared, soft-deletes gone ones."""
    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    # add one image, remove one
    from tests.conftest import make_rgb_image
    import numpy as np

    make_rgb_image(np.random.default_rng(77)).save(root / "newcomer.png")
    paths[0].unlink()
    assert main([*base, "refresh", str(root)]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["tagged"] >= 1
    assert stats["missing"] >= 1
    # the newcomer is searchable, the removed file is not
    assert main([*base, "search", "1girl", "--backend", "sql", "--limit", "100"]) == 0
    out = capsys.readouterr().out
    assert "newcomer.png" in out
    assert paths[0].name not in out


def test_trash_list_and_restore_roundtrip(env, capsys, tmp_path):
    """ket trash lists the manifest and --restore-all moves files back and
    re-marks rows present (the reversal of dup --trash-duplicates)."""
    import shutil
    from pathlib import Path

    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()

    # plant an exact duplicate pair so --trash-duplicates has a victim
    dup_path = Path(root) / "copy_of_first.png"
    shutil.copyfile(paths[0], dup_path)
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    assert main([*base, "dup", "--hamming", "2", "--trash-duplicates"]) == 0
    capsys.readouterr()
    survivors = set(Path(root).iterdir())
    trashed_from_disk = ({Path(p) for p in paths} | {dup_path}) - survivors
    assert len(trashed_from_disk) == 1  # exactly the non-keeper went away

    assert main([*base, "trash"]) == 0
    listing = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(listing) == 1
    assert Path(listing[0]["original"]) in trashed_from_disk

    assert main([*base, "trash", "--restore-all"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["restored"] and out["remaining"] == 0
    assert Path(listing[0]["original"]).exists()  # file is back

    # row present again: both files answer searches after a fresh index pass
    assert main([*base, "trash"]) == 0
    assert "0 trashed" in capsys.readouterr().err


def test_trash_restore_never_clobbers_new_file(env, capsys):
    """If a different file occupies the original path, restore skips it and
    keeps the manifest record (no silent data loss)."""
    import shutil
    from pathlib import Path

    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    dup_path = Path(root) / "copy2.png"
    shutil.copyfile(paths[0], dup_path)
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    assert main([*base, "dup", "--hamming", "2", "--trash-duplicates"]) == 0
    capsys.readouterr()
    assert main([*base, "trash"]) == 0
    listing = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(listing) == 1
    original = Path(listing[0]["original"])
    original.write_bytes(b"a brand-new unrelated file")  # path re-occupied

    assert main([*base, "trash", "--restore-all"]) == 0
    captured = capsys.readouterr()
    out = json.loads(captured.out.strip().splitlines()[-1])
    assert out["restored"] == [] and out["remaining"] == 1  # record kept
    assert "skip" in captured.err
    assert original.read_bytes() == b"a brand-new unrelated file"  # untouched


def test_trash_restore_flag_without_ids_errors(env, capsys):
    base, root, paths = env
    with pytest.raises(SystemExit, match="restore"):
        main([*base, "trash", "--restore"])


def test_ann_similar_to_uses_stored_embeddings(env, capsys):
    """ket ann --similar-to ranks by cosine over stored embeddings without
    loading any model (CLI mirror of GET /similar)."""
    import numpy as np

    from kobato_eyes_tpu.core.pipeline.embed_stage import store_embeddings
    from kobato_eyes_tpu.db.connection import bootstrap
    from kobato_eyes_tpu.utils.paths import get_app_paths

    base, root, paths = env
    assert main([*base, "index"]) == 0
    capsys.readouterr()
    db = get_app_paths(base[3]).db_path
    conn = bootstrap(db)
    ids = [int(r["id"]) for r in conn.execute("SELECT id FROM files ORDER BY id")]
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(len(ids), 8)).astype(np.float32)
    vecs[1] = vecs[0]  # plant an exact neighbor
    with conn:
        store_embeddings(conn, list(zip(ids, vecs)))
    conn.close()

    assert main([*base, "ann", "--similar-to", str(ids[0]), "--limit", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    top_score = float(lines[0].split()[0])
    assert top_score == pytest.approx(1.0, abs=1e-4)

    with pytest.raises(SystemExit, match="no embedding"):
        main([*base, "ann", "--similar-to", "999999"])


def test_validate_checkpoint_push_button(tmp_path, capsys):
    """ket validate-checkpoint: import -> exact-vs-fast parity -> tag parity
    in one shot (the real-weight day-one command; VERDICT r3 #4)."""
    from kobato_eyes_tpu.models.tagger import WD14Tagger, save_checkpoint

    t = WD14Tagger(arch="vit", preset="tiny", image_size=64, fast_math=False)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, t.params)
    rc = main([
        "validate-checkpoint", str(ckpt), "--arch", "vit", "--preset", "tiny",
        "--image-size", "64", "--classes", str(len(t.labels)), "--images", "2",
    ])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert report["ok"] is True
    assert report["finite"] is True
    assert report["import"] == "orbax"
    assert report["max_prob_deviation"] <= report["prob_tolerance"]
