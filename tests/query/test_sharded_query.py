"""Mesh-sharded query engine vs the single-chip path: exact result identity.

The sharded evaluator (query/sharded.py) must return the SAME
result lists as ``search_epoch`` without a mesh, for every query shape the
single-chip parity suite exercises — tag terms, category gates, score
inequalities and exact equality, NOT/AND/OR nesting, unknown tags — across
all four orderings and paging.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
from kobato_eyes_tpu.parallel.mesh import make_mesh
from kobato_eyes_tpu.query.engine import build_epoch, search_epoch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)

TAG_POOL = [
    ("1girl", 0), ("solo", 0), ("long_hair", 0), ("smile", 0), ("blue_eyes", 0),
    ("some_char", 4), ("other_char", 4), ("franchise_a", 3), ("franchise_b", 3),
    ("rating_safe", 2), ("artist_x", 1), ("highres", 5),
]

QUERIES = [
    "",
    "1girl",
    "1girl solo",
    "1girl OR solo",
    "1girl -smile",
    "NOT smile",
    "( 1girl OR solo ) long_hair",
    "category:character",
    "category:character score>=0.5",
    "score>=0.9",
    "score<0.3",
    "score<=0.25",
    "1girl AND ( some_char OR other_char )",
    "-( 1girl solo )",
    "unknown_tag",
    "1girl OR unknown_tag",
]


@pytest.fixture(scope="module")
def epoch(tmp_path_factory):
    reset_bootstrap_cache()
    db = tmp_path_factory.mktemp("sqdb") / "catalog.sqlite"
    conn = bootstrap(db)
    rng = np.random.default_rng(11)
    items = []
    for i in range(300):
        fid = upsert_file(
            conn, path=f"/data/img_{i:04d}.png", size=1000 + i,
            mtime=1e9 + (i % 41) * 100,
        )
        n_tags = int(rng.integers(0, 8))
        picks = rng.choice(len(TAG_POOL), size=n_tags, replace=False)
        tags = [
            (TAG_POOL[p][0], float(rng.uniform(0.05, 1.0)), TAG_POOL[p][1])
            for p in picks
        ]
        items.append(TaggingItem(file_id=fid, tags=tags, tagger_sig="t"))
    write_tagging_batch(conn, items)
    ep = build_epoch(conn)
    conn.close()
    return ep


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=8, model=1)


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("order_by", ["relevance", "mtime", "path", "id"])
def test_sharded_matches_single_chip(epoch, mesh, query, order_by):
    thr = {0: 0.35, 4: 0.25, 3: 0.25}
    single = search_epoch(
        epoch, query, thresholds=thr, order_by=order_by, limit=50
    )
    sharded = search_epoch(
        epoch, query, thresholds=thr, order_by=order_by, limit=50, mesh=mesh
    )
    assert [(r.file_id, r.relevance) for r in sharded] == [
        (r.file_id, r.relevance) for r in single
    ]


def test_sharded_paging_and_exact_score(epoch, mesh):
    # exact-equality score term exercises the validity-guarded scatter: a
    # score==0.0 query must NOT light up local row 0 from padding entries
    for query in ["score>=0.0", "1girl score>=0.2"]:
        for off in (0, 10, 40):
            a = search_epoch(epoch, query, limit=7, offset=off)
            b = search_epoch(epoch, query, limit=7, offset=off, mesh=mesh)
            assert [r.file_id for r in a] == [r.file_id for r in b]


def test_sharded_mesh_2dev(epoch):
    """Non-trivial model axis: only the data axis shards the rows."""
    mesh = make_mesh(data=2, model=4)
    a = search_epoch(epoch, "1girl OR solo", limit=100)
    b = search_epoch(epoch, "1girl OR solo", limit=100, mesh=mesh)
    assert [r.file_id for r in a] == [r.file_id for r in b]


def test_unshardable_mesh_falls_back_to_single_chip(epoch):
    """A data axis that cannot divide the padded file rows (non-power-of-two
    mesh) must serve the query single-chip with a warning, not raise."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()[:3]  # 3 does not divide the power-of-two n_pad
    if len(devs) < 3:
        pytest.skip("needs 3 devices")
    mesh = Mesh(np.array(devs).reshape(3, 1), ("data", "model"))
    solo = search_epoch(epoch, "1girl OR smile", limit=50)
    via_mesh = search_epoch(epoch, "1girl OR smile", limit=50, mesh=mesh)
    assert [(r.file_id, r.relevance) for r in via_mesh] == [
        (r.file_id, r.relevance) for r in solo
    ]


def test_unshardable_verdict_memoized(epoch, caplog):
    """The unshardable (epoch, mesh) verdict is cached: the shard attempt and
    its warning happen once, not per request on a hot serving path."""
    import logging

    import jax
    from jax.sharding import Mesh

    from kobato_eyes_tpu.query import engine as eng

    devs = jax.devices()[:3]
    if len(devs) < 3:
        pytest.skip("needs 3 devices")
    mesh = Mesh(np.array(devs).reshape(3, 1), ("data", "model"))
    eng._UNSHARDABLE_VERDICTS.pop(epoch, None)
    with caplog.at_level(logging.WARNING, logger="kobato_eyes_tpu.query.engine"):
        first = search_epoch(epoch, "1girl", limit=10, mesh=mesh)
        n_warn_first = sum(
            "cannot shard" in r.message for r in caplog.records
        )
        second = search_epoch(epoch, "1girl", limit=10, mesh=mesh)
        n_warn_total = sum(
            "cannot shard" in r.message for r in caplog.records
        )
    assert n_warn_first == 1
    assert n_warn_total == 1, "verdict must be memoized per (epoch, mesh)"
    assert [r.file_id for r in first] == [r.file_id for r in second]
    solo = search_epoch(epoch, "1girl", limit=10)
    assert [r.file_id for r in second] == [r.file_id for r in solo]
