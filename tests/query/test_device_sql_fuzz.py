"""Property-based fuzz parity: device query engine vs the SQL spec.

tests/query/test_device_sql_parity.py proves parity on 15 hand-picked
queries; here hypothesis generates queries from the grammar — biased
toward tags that actually exist in a random catalog so results are
non-trivial — plus random per-category thresholds, orderings, and
limit/offset windows, and asserts the device engine returns exactly the
SQL backend's rows (ids AND relevance) on every example.

Reference analog: the hypothesis grammar coverage in the reference's
tests/core/test_query.py, extended to end-to-end execution parity (the
repo's acceptance criterion per CLAUDE.md design invariants).
"""

from __future__ import annotations

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings

# soak knob: KET_FUZZ_SCALE=20 multiplies every max_examples (relay-down bug hunts, CI soak jobs)
import os as _os
try:
    _FUZZ_SCALE = max(1, int(_os.environ.get("KET_FUZZ_SCALE", "1")))
except ValueError:
    _FUZZ_SCALE = 1  # env policy: bad values degrade to defaults, never raise
from hypothesis import strategies as st

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import (TaggingItem, search_files,
                                           upsert_file, write_tagging_batch)
from kobato_eyes_tpu.query.ast import extract_positive_tag_terms
from kobato_eyes_tpu.query.engine import build_epoch, search_epoch
from kobato_eyes_tpu.query.sql import normalize_thresholds, translate_query

TAG_POOL = [
    ("1girl", 0), ("solo", 0), ("long_hair", 0), ("smile", 0), ("blue_eyes", 0),
    ("some_char", 4), ("other_char", 4), ("franchise_a", 3), ("franchise_b", 3),
    ("rating_safe", 2), ("artist_x", 1), ("highres", 5),
]
KNOWN = [t for t, _ in TAG_POOL]
CATS = ["general", "artist", "rating", "copyright", "character", "meta"]


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    reset_bootstrap_cache()
    path = tmp_path_factory.mktemp("fuzzdb") / "catalog.sqlite"
    conn = bootstrap(path)
    rng = np.random.default_rng(13)
    items = []
    for i in range(150):
        fid = upsert_file(
            conn, path=f"/lib/{i % 9}/img_{i:04d}.png", size=500 + i,
            mtime=1e9 + (i % 23) * 777,
        )
        n_tags = int(rng.integers(0, 9))
        picks = rng.choice(len(TAG_POOL), size=n_tags, replace=False)
        tags = [
            (TAG_POOL[p][0], float(rng.uniform(0.05, 1.0)), TAG_POOL[p][1])
            for p in picks
        ]
        items.append(TaggingItem(file_id=fid, tags=tags, tagger_sig="t"))
    write_tagging_batch(conn, items)
    epoch = build_epoch(conn, version=1)
    yield conn, epoch
    conn.close()


@st.composite
def queries(draw) -> str:
    depth = draw(st.integers(0, 3))

    def atom() -> str:
        kind = draw(st.sampled_from(["known", "known", "known", "unknown",
                                     "cat", "score"]))
        if kind == "known":
            return draw(st.sampled_from(KNOWN))
        if kind == "unknown":
            return "zz_" + draw(st.sampled_from(["a", "b", "c"]))
        if kind == "cat":
            return "category:" + draw(st.sampled_from(CATS))
        op = draw(st.sampled_from([">=", "<=", "=", ">", "<"]))
        return f"score{op}{draw(st.floats(0, 1, allow_nan=False)):.2f}"

    def expr(d: int) -> str:
        if d == 0:
            return atom()
        kind = draw(st.sampled_from(
            ["atom", "atom", "not", "neg", "and", "or", "paren", "implicit"]))
        if kind == "atom":
            return atom()
        if kind == "not":
            return "NOT " + expr(d - 1)
        if kind == "neg":
            return "-" + atom()
        if kind == "and":
            return expr(d - 1) + " AND " + expr(d - 1)
        if kind == "or":
            return expr(d - 1) + " OR " + expr(d - 1)
        if kind == "implicit":
            return expr(d - 1) + " " + atom()
        return "( " + expr(d - 1) + " )"

    return expr(depth)


@st.composite
def thresholds(draw):
    n = draw(st.integers(0, 3))
    cats = draw(
        st.lists(st.sampled_from([0, 1, 2, 3, 4, 5]), min_size=n, max_size=n,
                 unique=True))
    return {c: round(draw(st.floats(0.0, 1.0, allow_nan=False)), 2) for c in cats}


@settings(
    max_examples=60 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    query=queries(),
    thr=thresholds(),
    order_by=st.sampled_from(["relevance", "mtime", "path", "id"]),
    limit=st.sampled_from([1, 7, 50, 1000]),
    offset=st.sampled_from([0, 0, 0, 3, 60]),
)
def test_fuzz_device_matches_sql(db, query, thr, order_by, limit, offset):
    conn, epoch = db
    frag = translate_query(query, thresholds=thr)
    sql_rows = search_files(
        conn, frag.where, frag.params,
        positive_tags=extract_positive_tag_terms(query),
        thresholds=normalize_thresholds(thr),
        order_by=order_by, limit=limit, offset=offset, hydrate=False,
    )
    dev_rows = search_epoch(
        epoch, query, thresholds=thr, order_by=order_by, limit=limit,
        offset=offset,
    )
    assert [r.file_id for r in dev_rows] == [r.file_id for r in sql_rows], (
        query, thr, order_by, limit, offset)
    if order_by == "relevance":
        np.testing.assert_allclose(
            [r.relevance for r in dev_rows], [r.relevance for r in sql_rows],
            atol=1e-5,
        )
