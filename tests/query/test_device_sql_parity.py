"""Device query engine vs SQL backend: result-set parity on random catalogs."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, search_files, upsert_file, write_tagging_batch
from kobato_eyes_tpu.query.ast import extract_positive_tag_terms
from kobato_eyes_tpu.query.engine import build_epoch, search_epoch
from kobato_eyes_tpu.query.sql import normalize_thresholds, translate_query

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
    "1girl AND ( some_char OR other_char )",
    "-( 1girl solo )",
    "unknown_tag",
    "1girl OR unknown_tag",
]


@pytest.fixture(scope="module")
def catalog(tmp_path_factory):
    reset_bootstrap_cache()
    db = tmp_path_factory.mktemp("qdb") / "catalog.sqlite"
    conn = bootstrap(db)
    rng = np.random.default_rng(7)
    items = []
    for i in range(120):
        fid = upsert_file(
            conn, path=f"/data/img_{i:04d}.png", size=1000 + i, mtime=1e9 + (i % 37) * 100
        )
        n_tags = int(rng.integers(0, 8))
        picks = rng.choice(len(TAG_POOL), size=n_tags, replace=False)
        tags = [(TAG_POOL[p][0], float(rng.uniform(0.05, 1.0)), TAG_POOL[p][1]) for p in picks]
        items.append(TaggingItem(file_id=fid, tags=tags, tagger_sig="t"))
    write_tagging_batch(conn, items)
    yield conn
    conn.close()


@pytest.fixture(scope="module")
def epoch(catalog):
    return build_epoch(catalog, version=1)


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("order_by", ["relevance", "mtime", "id"])
def test_device_matches_sql(catalog, epoch, query, order_by):
    thr = {}  # fallback thresholds
    frag = translate_query(query, thresholds=thr)
    sql_rows = search_files(
        catalog, frag.where, frag.params,
        positive_tags=extract_positive_tag_terms(query),
        thresholds=normalize_thresholds(thr),
        order_by=order_by, limit=1000, hydrate=False,
    )
    dev_rows = search_epoch(epoch, query, thresholds=thr, order_by=order_by, limit=1000)
    assert [r.file_id for r in dev_rows] == [r.file_id for r in sql_rows], query
    if order_by == "relevance":
        np.testing.assert_allclose(
            [r.relevance for r in dev_rows], [r.relevance for r in sql_rows], atol=1e-5
        )


def test_device_threshold_overrides(catalog, epoch):
    thr = {0: 0.9, 4: 0.1}
    for query in ["1girl", "category:character", "1girl some_char"]:
        frag = translate_query(query, thresholds=thr)
        sql_rows = search_files(
            catalog, frag.where, frag.params,
            positive_tags=extract_positive_tag_terms(query),
            thresholds=normalize_thresholds(thr),
            order_by="id", limit=1000, hydrate=False,
        )
        dev_rows = search_epoch(epoch, query, thresholds=thr, order_by="id", limit=1000)
        assert [r.file_id for r in dev_rows] == [r.file_id for r in sql_rows], query


def test_pagination(catalog, epoch):
    full = search_epoch(epoch, "", order_by="id", limit=10_000)
    page1 = search_epoch(epoch, "", order_by="id", limit=50, offset=0)
    page2 = search_epoch(epoch, "", order_by="id", limit=50, offset=50)
    assert [r.file_id for r in page1 + page2] == [r.file_id for r in full[:100]]
