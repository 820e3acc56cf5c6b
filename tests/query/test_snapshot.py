"""Epoch snapshot save/restore parity."""

from __future__ import annotations

import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
from kobato_eyes_tpu.query.engine import build_epoch, search_epoch
from kobato_eyes_tpu.query.snapshot import load_epoch, save_epoch


def test_snapshot_roundtrip(tmp_path):
    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "c.sqlite")
    try:
        items = []
        for i in range(20):
            fid = upsert_file(conn, path=f"/x/{i}.png", mtime=1e9 + i)
            tags = [("alpha", 0.9, 0)] if i % 2 == 0 else [("beta", 0.7, 4)]
            items.append(TaggingItem(fid, tags))
        write_tagging_batch(conn, items)
        epoch = build_epoch(conn, version=3)
    finally:
        conn.close()

    path = save_epoch(epoch, tmp_path / "snap" / "epoch_v3")
    restored = load_epoch(path)
    assert restored.version == 3
    assert restored.num_files == epoch.num_files
    assert restored.tag_names == epoch.tag_names

    for q in ["alpha", "beta", "alpha OR beta", "-alpha"]:
        a = [r.file_id for r in search_epoch(epoch, q, order_by="id", limit=100)]
        b = [r.file_id for r in search_epoch(restored, q, order_by="id", limit=100)]
        assert a == b, q


def test_snapshot_bad_format(tmp_path):
    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "c2.sqlite")
    try:
        upsert_file(conn, path="/y/a.png")
        epoch = build_epoch(conn)
    finally:
        conn.close()
    p = save_epoch(epoch, tmp_path / "e")
    sidecar = p.with_suffix(".json")
    sidecar.write_text(sidecar.read_text().replace('"format": 2', '"format": 99'))
    with pytest.raises(ValueError):
        load_epoch(p)


def test_snapshot_digest_mismatch(tmp_path):
    """A sidecar/npz pair from different epochs with identical counts must be
    rejected (crash between the two renames after a count-preserving delta)."""
    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "c3.sqlite")
    try:
        fid = upsert_file(conn, path="/z/a.png")
        write_tagging_batch(conn, [TaggingItem(fid, [("alpha", 0.9, 0)])])
        epoch_a = build_epoch(conn, version=1)
        # count-preserving change: same file count, same nnz, different score
        write_tagging_batch(conn, [TaggingItem(fid, [("alpha", 0.4, 0)])])
        epoch_b = build_epoch(conn, version=2)
    finally:
        conn.close()
    pa = save_epoch(epoch_a, tmp_path / "a")
    pb = save_epoch(epoch_b, tmp_path / "b")
    # simulate the torn pair: b's sidecar with a's arrays
    pb.with_suffix(".json").replace(pa.with_suffix(".json"))
    with pytest.raises(ValueError, match="digest"):
        load_epoch(pa)
