"""Native catalog fetch == Python fetchall path (the executable spec)."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
from kobato_eyes_tpu.query.engine import (
    _fetch_file_tag_arrays_native,
    build_epoch,
    search_epoch,
)


@pytest.fixture
def catalog(tmp_path):
    reset_bootstrap_cache()
    db = tmp_path / "c.sqlite"
    conn = bootstrap(db)
    rng = np.random.default_rng(3)
    for i in range(300):
        fid = upsert_file(conn, path=f"/n/{i:04d}.png", mtime=1e9 + i)
        tags = [
            (f"t{int(k)}", float(rng.uniform(0.05, 1.0)), int(k) % 6)
            for k in rng.integers(0, 40, size=int(rng.integers(1, 12)))
        ]
        # dedup tag names within a file (replace semantics keep the last)
        tags = list({t[0]: t for t in tags}.values())
        write_tagging_batch(conn, [TaggingItem(fid, tags)])
    yield conn
    conn.close()


def test_native_fetch_matches_python(catalog):
    native = _fetch_file_tag_arrays_native(catalog)
    if native is None:
        pytest.skip("native fetch unavailable in this environment")
    rows = catalog.execute(
        "SELECT file_id, tag_id, score FROM file_tags"
    ).fetchall()
    fid, tid, sc = native
    assert len(fid) == len(rows)
    want_f = np.array([r[0] for r in rows], dtype=np.int64)
    want_t = np.array([r[1] for r in rows], dtype=np.int64)
    want_s = np.array([r[2] for r in rows], dtype=np.float64)
    np.testing.assert_array_equal(fid, want_f)
    np.testing.assert_array_equal(tid, want_t)
    # bit-exact: both sides read the same stored doubles
    np.testing.assert_array_equal(sc, want_s)


def test_build_epoch_native_vs_python_paths(catalog, monkeypatch):
    epoch_native = build_epoch(catalog)
    import kobato_eyes_tpu.query.engine as eng

    monkeypatch.setattr(eng, "_fetch_file_tag_arrays_native", lambda conn: None)
    epoch_py = build_epoch(catalog)
    np.testing.assert_array_equal(epoch_native.rows_np, epoch_py.rows_np)
    np.testing.assert_array_equal(epoch_native.scores_np, epoch_py.scores_np)
    np.testing.assert_array_equal(epoch_native.offsets, epoch_py.offsets)
    for q in ("t0", "t1 OR t2", "t3 -t4"):
        a = [r.file_id for r in search_epoch(epoch_native, q, order_by="id", limit=500)]
        b = [r.file_id for r in search_epoch(epoch_py, q, order_by="id", limit=500)]
        assert a == b, q


def test_in_transaction_stays_on_python_path(catalog):
    """An open transaction must not consult the committed-state side
    connection (its uncommitted rows would be invisible)."""
    catalog.execute("BEGIN")
    try:
        catalog.execute(
            "UPDATE file_tags SET score = 0.123 WHERE (file_id, tag_id) = "
            "(SELECT file_id, tag_id FROM file_tags LIMIT 1)"
        )
        assert catalog.in_transaction
        from kobato_eyes_tpu.query.engine import _fetch_file_tag_arrays

        fid, tid, sc = _fetch_file_tag_arrays(catalog)
        assert (sc == 0.123).sum() == 1  # saw its own uncommitted row
    finally:
        catalog.rollback()
