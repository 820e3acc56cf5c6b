"""Batched multi-query dispatch (VERDICT r4 #4): search_epoch_batch must be
result-identical to per-query search_epoch while sharing compiled programs
across same-structure queries and syncing once per batch."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
from kobato_eyes_tpu.query.engine import (
    _BATCHED_STRUCTURE_CACHE,
    build_epoch,
    search_epoch,
    search_epoch_batch,
)

TAG_POOL = [
    ("1girl", 0), ("solo", 0), ("long_hair", 0), ("smile", 0), ("blue_eyes", 0),
    ("some_char", 4), ("other_char", 4), ("franchise_a", 3), ("rating_safe", 2),
    ("artist_x", 1), ("highres", 5),
]

WORKLOAD = [
    "1girl",
    "solo",                      # same structure as 1girl -> shares a program
    "smile",
    "1girl solo",
    "long_hair blue_eyes",       # same structure as "1girl solo"
    "1girl OR smile",
    "-( smile ) score>=0.3",
    "category:character",
    "category:character score>=0.5",
    "unknown_tag OR 1girl",
    "",
    "unknown_tag",               # empty result set
]


@pytest.fixture(scope="module")
def epoch(tmp_path_factory):
    reset_bootstrap_cache()
    db = tmp_path_factory.mktemp("batchq") / "catalog.sqlite"
    conn = bootstrap(db)
    rng = np.random.default_rng(31)
    items = []
    for i in range(400):
        fid = upsert_file(
            conn, path=f"/b/img_{i:04d}.png", size=1000 + i,
            mtime=1e9 + (i % 53) * 10,
        )
        picks = rng.choice(len(TAG_POOL), size=int(rng.integers(0, 6)), replace=False)
        items.append(TaggingItem(
            file_id=fid,
            tags=[(TAG_POOL[p][0], float(rng.uniform(0.05, 1.0)), TAG_POOL[p][1])
                  for p in picks],
            tagger_sig="t",
        ))
    write_tagging_batch(conn, items)
    ep = build_epoch(conn)
    conn.close()
    return ep


@pytest.mark.parametrize("order_by", ["relevance", "mtime", "path", "id"])
def test_batch_identical_to_per_query(epoch, order_by):
    thr = {0: 0.35, 4: 0.25, 3: 0.25}
    batched = search_epoch_batch(
        epoch, WORKLOAD, thresholds=thr, order_by=order_by, limit=50
    )
    assert len(batched) == len(WORKLOAD)
    for q, rows in zip(WORKLOAD, batched):
        solo = search_epoch(epoch, q, thresholds=thr, order_by=order_by, limit=50)
        assert [(r.file_id, r.relevance) for r in rows] == [
            (r.file_id, r.relevance) for r in solo
        ], q


def test_batch_paging(epoch):
    for off in (0, 5, 30):
        batched = search_epoch_batch(epoch, ["1girl", "1girl OR smile"],
                                     limit=7, offset=off)
        for q, rows in zip(["1girl", "1girl OR smile"], batched):
            solo = search_epoch(epoch, q, limit=7, offset=off)
            assert [r.file_id for r in rows] == [r.file_id for r in solo]


def test_same_structure_queries_share_one_program(epoch):
    """Four single-tag queries = ONE compiled batched variant (per bucket
    shape), not four."""
    _BATCHED_STRUCTURE_CACHE.clear()
    qs = ["1girl", "solo", "smile", "blue_eyes"]
    search_epoch_batch(epoch, qs, limit=10)
    # single-tag structures may split across bucket sizes (posting-length
    # dependent), but the variant count must be well under one per query
    tag_variants = [
        k for k in _BATCHED_STRUCTURE_CACHE if k[0] == ("tag", 0)
    ]
    assert 1 <= len(tag_variants) <= 3


def test_batch_padding_to_power_of_two(epoch):
    """3 same-structure queries pad to a 4-wide program; results unaffected."""
    qs = ["1girl", "solo", "smile"]
    batched = search_epoch_batch(epoch, qs, limit=20)
    for q, rows in zip(qs, batched):
        solo = search_epoch(epoch, q, limit=20)
        assert [r.file_id for r in rows] == [r.file_id for r in solo]


def test_single_query_batch(epoch):
    batched = search_epoch_batch(epoch, ["1girl solo"], limit=10)
    solo = search_epoch(epoch, "1girl solo", limit=10)
    assert [r.file_id for r in batched[0]] == [r.file_id for r in solo]


def test_batch_rejects_bad_order(epoch):
    with pytest.raises(ValueError, match="order_by"):
        search_epoch_batch(epoch, ["1girl"], order_by="nope")
