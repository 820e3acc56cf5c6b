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
    sidecar.write_text(sidecar.read_text().replace('"format": 1', '"format": 99'))
    with pytest.raises(ValueError):
        load_epoch(p)
