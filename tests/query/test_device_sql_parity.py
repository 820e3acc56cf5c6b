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
@pytest.mark.parametrize("order_by", ["relevance", "mtime", "path", "id"])
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


def test_partial_topk_equals_full_sort_under_ties(monkeypatch):
    """The partial top-k path must return exactly what the full lexsort
    returns, including under massive ties (zero relevance everywhere,
    repeated mtimes)."""
    import numpy as np

    import kobato_eyes_tpu.query.engine as eng

    rng = np.random.default_rng(3)
    n = 50_000
    rel = np.where(rng.random(n) < 0.9, 0.0, rng.random(n))  # 90% exact ties
    mtimes = rng.integers(0, 50, size=n).astype(np.float64)  # heavy tie groups
    ids = rng.permutation(n).astype(np.int64)

    for k in (1, 37, 200, 1000):
        full = np.lexsort((ids, -mtimes, -rel))[:k]
        cols = [-rel, -mtimes, ids]
        sel = eng._topk_select(cols, k)
        assert len(sel) >= k
        sub = np.lexsort((ids[sel], -mtimes[sel], -rel[sel]))[:k]
        got = sel[sub]
        np.testing.assert_array_equal(ids[got], ids[full])
        np.testing.assert_array_equal(rel[got], rel[full])


def test_search_epoch_partial_path_matches_sql(tmp_path, monkeypatch):
    """Force the partial top-k path at small scale and assert device==SQL."""
    import numpy as np

    import kobato_eyes_tpu.query.engine as eng
    from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
    from kobato_eyes_tpu.db.repository import (
        TaggingItem,
        search_files,
        upsert_file,
        write_tagging_batch,
    )
    from kobato_eyes_tpu.query.ast import extract_positive_tag_terms
    from kobato_eyes_tpu.query.sql import normalize_thresholds, translate_query

    monkeypatch.setattr(eng, "_TOPK_MIN_HITS", 8)  # engage the partial path
    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "p.sqlite")
    rng = np.random.default_rng(9)
    for i in range(400):
        fid = upsert_file(
            conn, path=f"/p/{i:04d}.png", mtime=1e9 + int(rng.integers(0, 7))
        )
        tags = [("common", float(rng.choice([0.5, 0.9])), 0)]
        if i % 3 == 0:
            tags.append(("rare", 0.8, 0))
        write_tagging_batch(conn, [TaggingItem(fid, tags)])
    epoch = eng.build_epoch(conn)
    thr = normalize_thresholds({})
    for q, order in (("common", "relevance"), ("common", "mtime"), ("common", "id"),
                     ("common", "path"), ("common OR rare", "relevance"),
                     ("common OR rare", "path")):
        dev = [
            r.file_id
            for r in eng.search_epoch(epoch, q, order_by=order, limit=25, offset=5)
        ]
        frag = translate_query(q, thresholds={})
        sql = [
            r.file_id
            for r in search_files(
                conn, frag.where, frag.params,
                positive_tags=extract_positive_tag_terms(q),
                thresholds=thr, order_by=order, limit=25, offset=5, hydrate=False,
            )
        ]
        assert dev == sql, (q, order)
    conn.close()


def test_score_extrema_panels_all_operators(tmp_path):
    """Bare score terms (>=, >, <=, <, =) answered by the per-file extrema
    panels must equal the SQL EXISTS backend — including untagged files
    (no postings => EXISTS always false)."""
    import numpy as np

    import kobato_eyes_tpu.query.engine as eng
    from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
    from kobato_eyes_tpu.db.repository import (
        TaggingItem,
        search_files,
        upsert_file,
        write_tagging_batch,
    )
    from kobato_eyes_tpu.query.ast import extract_positive_tag_terms
    from kobato_eyes_tpu.query.sql import normalize_thresholds, translate_query

    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "sp.sqlite")
    rng = np.random.default_rng(13)
    for i in range(120):
        fid = upsert_file(conn, path=f"/sp/{i:03d}.png", mtime=1e9 + i)
        if i % 7 == 0:
            continue  # untagged file: no postings at all
        tags = [
            (f"t{int(k)}", float(rng.choice([0.1, 0.35, 0.5, 0.9])), int(k) % 6)
            for k in rng.integers(0, 20, size=int(rng.integers(1, 6)))
        ]
        tags = list({t[0]: t for t in tags}.values())
        write_tagging_batch(conn, [TaggingItem(fid, tags)])
    epoch = eng.build_epoch(conn)
    thr = normalize_thresholds({})
    for q in ("score>=0.5", "score>0.5", "score<=0.1", "score<0.35",
              "score=0.35", "score>=0.35 -t0", "t1 score<0.9"):
        dev = [r.file_id for r in eng.search_epoch(epoch, q, order_by="id", limit=300)]
        frag = translate_query(q, thresholds={})
        sql = [
            r.file_id
            for r in search_files(
                conn, frag.where, frag.params,
                positive_tags=extract_positive_tag_terms(q),
                thresholds=thr, order_by="id", limit=300, hydrate=False,
            )
        ]
        assert dev == sql, q
    conn.close()


def test_topk_select_nan_falls_back_to_full_sort():
    """NaN in the primary column must never silently truncate results
    (advisor round 2): any NaN manifestation takes the exact full path."""
    import numpy as np

    import kobato_eyes_tpu.query.engine as eng

    n = 1000
    rng = np.random.default_rng(5)
    base = rng.random(n)
    ids = np.arange(n, dtype=np.int64)

    # scattered NaNs: partition sorts them last, so the k smallest valid rows
    # are still selected — equivalence with the full sort, no truncation
    c0 = base.copy()
    c0[::7] = np.nan
    sel = eng._topk_select([c0, ids], 50)
    assert len(sel) >= 50
    full = np.lexsort((ids, c0))[:50]
    sub = np.lexsort((ids[sel], c0[sel]))[:50]
    np.testing.assert_array_equal(np.sort(sel[sub]), np.sort(full))

    # every value NaN: cutoff is NaN, strict and tied both empty -> fallback
    all_nan = np.full(n, np.nan)
    sel = eng._topk_select([all_nan, ids], 50)
    assert len(sel) == n

    # more NaNs than n-k: fewer than k valid rows exist -> NaN cutoff -> fallback
    mostly_nan = np.full(n, np.nan)
    mostly_nan[:20] = base[:20]
    sel = eng._topk_select([mostly_nan, ids], 50)
    assert len(sel) == n

    # clean data still selects exactly (sanity that the guard is inert)
    sel = eng._topk_select([base, ids], 50)
    assert len(sel) >= 50
    full = np.lexsort((ids, base))[:50]
    sub = np.lexsort((ids[sel], base[sel]))[:50]
    np.testing.assert_array_equal(np.sort(sel[sub]), np.sort(full))


def test_path_ranks_order_isomorphic_to_strings():
    import numpy as np

    import kobato_eyes_tpu.query.engine as eng

    paths = [
        "/b/x.png", "/a/z.png", "/a/b.png", "/c.png", "/a/b.png",
        "/A/upper.png", "/a/éaccent.png", "/a/b2.png",
    ]
    epoch = eng.build_epoch.__globals__  # noqa: F841 — just to import module
    # construct ranks directly as the property does
    ranks = np.unique(np.asarray(paths), return_inverse=True)[1]
    by_rank = np.lexsort((np.arange(len(paths)), ranks))
    by_str = np.lexsort((np.arange(len(paths)), np.asarray(paths)))
    np.testing.assert_array_equal(by_rank, by_str)


def test_structure_cache_evicts_oldest_not_all():
    import kobato_eyes_tpu.query.engine as eng

    cache = {f"k{i}": i for i in range(eng._PER_EPOCH_CACHE_CAP)}
    orig = eng._STRUCTURE_CACHE
    try:
        eng._STRUCTURE_CACHE = cache
        # simulate the eviction block
        if len(cache) >= eng._PER_EPOCH_CACHE_CAP:
            for old in list(cache)[: max(1, eng._PER_EPOCH_CACHE_CAP // 4)]:
                del cache[old]
        assert "k0" not in cache  # oldest gone
        assert f"k{eng._PER_EPOCH_CACHE_CAP - 1}" in cache  # newest kept
        assert len(cache) > 0
    finally:
        eng._STRUCTURE_CACHE = orig


def test_epoch_build_retries_on_concurrent_commit(tmp_path, monkeypatch):
    """A data_version bump during the read set triggers one snapshot-
    consistent rebuild under a read transaction (advisor round 2)."""
    import kobato_eyes_tpu.query.engine as eng
    from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
    from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch

    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "dv.sqlite")
    for i in range(20):
        fid = upsert_file(conn, path=f"/dv/{i:02d}.png", mtime=1e9 + i)
        write_tagging_batch(conn, [TaggingItem(fid, [("t", 0.9, 0)])])

    calls = {"n": 0}
    real_dv = eng._data_version

    def fake_dv(c):
        calls["n"] += 1
        # first pair mismatches (simulated concurrent commit), later calls agree
        if calls["n"] == 2:
            return real_dv(c) + 1
        return real_dv(c)

    monkeypatch.setattr(eng, "_data_version", fake_dv)
    epoch = eng.build_epoch(conn, version=3)
    assert calls["n"] >= 2
    assert epoch.num_files == 20
    rows = eng.search_epoch(epoch, "t", limit=100)
    assert len(rows) == 20
    assert not conn.in_transaction  # retry transaction fully unwound
    conn.close()
