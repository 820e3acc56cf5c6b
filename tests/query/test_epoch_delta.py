"""Incremental epoch updates vs full rebuild (must be indistinguishable)."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import (
    TaggingItem,
    delete_files,
    mark_files_absent,
    upsert_file,
    write_tagging_batch,
)
from kobato_eyes_tpu.query.engine import EpochManager, build_epoch, search_epoch, update_epoch

QUERIES = ["alpha", "beta OR gamma", "-alpha", "category:character", "score>=0.8", ""]


def _assert_equivalent(a, b):
    for q in QUERIES:
        ra = [(r.file_id, round(r.relevance, 5)) for r in search_epoch(a, q, order_by="id", limit=10_000)]
        rb = [(r.file_id, round(r.relevance, 5)) for r in search_epoch(b, q, order_by="id", limit=10_000)]
        assert ra == rb, q


@pytest.fixture
def conn(tmp_path):
    reset_bootstrap_cache()
    c = bootstrap(tmp_path / "d.sqlite")
    rng = np.random.default_rng(11)
    items = []
    for i in range(60):
        fid = upsert_file(c, path=f"/lib/{i:03d}.png", mtime=1e9 + i)
        tags = []
        if rng.random() < 0.7:
            tags.append(("alpha", float(rng.uniform(0.3, 1)), 0))
        if rng.random() < 0.4:
            tags.append(("beta", float(rng.uniform(0.3, 1)), 4))
        if rng.random() < 0.2:
            tags.append(("gamma", float(rng.uniform(0.3, 1)), 3))
        items.append(TaggingItem(fid, tags, tagger_sig="s"))
    write_tagging_batch(c, items)
    yield c
    c.close()


def test_delta_retag_matches_rebuild(conn):
    prev = build_epoch(conn, version=1)
    # retag three files with different tags
    changed = [int(r[0]) for r in conn.execute("SELECT id FROM files LIMIT 3")]
    write_tagging_batch(conn, [
        TaggingItem(changed[0], [("delta_tag", 0.95, 0)], tagger_sig="s2"),
        TaggingItem(changed[1], [("alpha", 0.1, 0), ("beta", 0.99, 4)], tagger_sig="s2"),
        TaggingItem(changed[2], [], tagger_sig="s2"),
    ])
    delta = update_epoch(conn, prev, changed_file_ids=changed, version=2)
    full = build_epoch(conn, version=2)
    _assert_equivalent(delta, full)
    assert "delta_tag" in delta.name_to_tid


def test_delta_new_files(conn):
    prev = build_epoch(conn, version=1)
    new_ids = []
    for i in range(5):
        fid = upsert_file(conn, path=f"/lib/new_{i}.png", mtime=2e9 + i)
        new_ids.append(fid)
    write_tagging_batch(conn, [TaggingItem(f, [("alpha", 0.9, 0)]) for f in new_ids])
    delta = update_epoch(conn, prev, changed_file_ids=new_ids, version=2)
    _assert_equivalent(delta, build_epoch(conn, version=2))


def test_delta_deletions(conn):
    prev = build_epoch(conn, version=1)
    ids = [int(r[0]) for r in conn.execute("SELECT id FROM files LIMIT 6")]
    mark_files_absent(conn, ids[:3])
    delete_files(conn, ids[3:6])
    conn.commit()
    delta = update_epoch(conn, prev, changed_file_ids=ids, version=2)
    _assert_equivalent(delta, build_epoch(conn, version=2))
    assert delta.num_files == prev.num_files - 6


def test_manager_delta_path(conn):
    mgr = EpochManager()
    assert mgr.apply_delta(conn, [1, 2]).version == 1  # no epoch yet -> full build
    fid = upsert_file(conn, path="/lib/zzz.png", mtime=3e9)
    write_tagging_batch(conn, [TaggingItem(fid, [("beta", 0.5, 4)])])
    epoch = mgr.apply_delta(conn, [fid])
    assert epoch.version == 2
    _assert_equivalent(epoch, build_epoch(conn, version=2))
    assert mgr.apply_delta(conn, []) is epoch  # no changes -> same epoch


def test_delta_vocab_shrink_falls_back(conn):
    """Deleting a tag row (non-append vocabulary) must still equal a rebuild."""
    prev = build_epoch(conn, version=1)
    # hard-delete the 'gamma' tag definition + its postings
    row = conn.execute("SELECT id FROM tags WHERE name='gamma'").fetchone()
    with conn:
        conn.execute("DELETE FROM file_tags WHERE tag_id=?", (int(row[0]),))
        conn.execute("DELETE FROM tags WHERE id=?", (int(row[0]),))
    # every file that had gamma changed; simplest correct delta input: all ids
    all_ids = [int(r[0]) for r in conn.execute("SELECT id FROM files")]
    delta = update_epoch(conn, prev, changed_file_ids=all_ids, version=2)
    _assert_equivalent(delta, build_epoch(conn, version=2))
    assert "gamma" not in delta.name_to_tid


def test_delta_bulk_retag_chunks_sql_variables(tmp_path):
    """A delta larger than SQLite's per-statement variable cap must not raise
    'too many SQL variables' (IN lists are chunked at 900)."""
    reset_bootstrap_cache()
    c = bootstrap(tmp_path / "bulk.sqlite")
    try:
        n = 1201
        items = [
            TaggingItem(upsert_file(c, path=f"/bulk/{i:04d}.png", mtime=1e9 + i),
                        [("alpha", 0.5, 0)], tagger_sig="s")
            for i in range(n)
        ]
        write_tagging_batch(c, items)
        prev = build_epoch(c, version=1)
        all_ids = [int(r[0]) for r in c.execute("SELECT id FROM files")]
        write_tagging_batch(
            c, [TaggingItem(fid, [("beta", 0.9, 4)], tagger_sig="s2") for fid in all_ids]
        )
        delta = update_epoch(c, prev, changed_file_ids=all_ids, version=2)
        full = build_epoch(c, version=2)
        _assert_equivalent(delta, full)
    finally:
        c.close()


def test_structure_programs_reused_across_epochs(conn):
    """Shape-generic evaluation: a delta epoch within the same padded buckets
    must reuse the compiled query programs (no per-epoch recompilation), and
    queries sharing a structure share one program."""
    from kobato_eyes_tpu.query import engine as E

    prev = build_epoch(conn, version=1)
    search_epoch(prev, "alpha OR beta")
    assert len(E._STRUCTURE_CACHE) >= 1
    fn = next(iter(E._STRUCTURE_CACHE.values()))
    traces_before = fn._cache_size()
    assert traces_before >= 1

    # delta epoch (same padded buckets at this scale): the SAME compiled
    # programs serve it — no recompilation after an epoch swap
    changed = [int(r[0]) for r in conn.execute("SELECT id FROM files LIMIT 2")]
    write_tagging_batch(conn, [
        TaggingItem(changed[0], [("beta", 0.9, 4)], tagger_sig="s2"),
        TaggingItem(changed[1], [("alpha", 0.7, 0)], tagger_sig="s2"),
    ])
    delta = update_epoch(conn, prev, changed_file_ids=changed, version=2)
    assert (delta.n_pad, delta.t_pad) == (prev.n_pad, prev.t_pad)
    assert len(delta.rows_dev) == len(prev.rows_dev)
    structures_before = len(E._STRUCTURE_CACHE)
    trace_counts = {k: f._cache_size() for k, f in E._STRUCTURE_CACHE.items()}
    search_epoch(delta, "alpha OR beta")
    assert len(E._STRUCTURE_CACHE) == structures_before
    assert {k: f._cache_size() for k, f in E._STRUCTURE_CACHE.items()} == trace_counts
