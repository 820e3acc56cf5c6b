"""SQL compiler edges: presence-only semantics, operator/shape validation.

``translate_query(..., thresholds=None)`` must match on mere tag presence
(no score gate), matching the documented contract; malformed AST nodes are
rejected with typed errors instead of emitting broken SQL.
"""

from __future__ import annotations

import pytest

from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import TaggingItem, search_files, upsert_file, write_tagging_batch
from kobato_eyes_tpu.query.sql import _compile, translate_query


@pytest.fixture
def conn(tmp_path):
    reset_bootstrap_cache()
    c = bootstrap(tmp_path / "q.sqlite")
    yield c
    c.close()


def _plant(conn, path: str, score: float) -> int:
    fid = upsert_file(conn, path=path, size=10, mtime=1e9)
    write_tagging_batch(conn, [TaggingItem(fid, [("cat_ears", score, 0)])])
    return fid


def test_thresholds_none_matches_presence_only(conn):
    low = _plant(conn, "/q/low.png", 0.05)   # below the 0.35 general default
    high = _plant(conn, "/q/high.png", 0.9)

    frag_gated = translate_query("cat_ears", thresholds={})
    gated = search_files(conn, frag_gated.where, frag_gated.params, hydrate=False)
    assert [r.file_id for r in gated] == [high]

    frag_presence = translate_query("cat_ears", thresholds=None)
    presence = search_files(conn, frag_presence.where, frag_presence.params, hydrate=False)
    assert {r.file_id for r in presence} == {low, high}


def test_category_presence_only_vs_gated(conn):
    low = _plant(conn, "/q/c1.png", 0.05)
    frag = translate_query("category:general", thresholds=None)
    rows = search_files(conn, frag.where, frag.params, hydrate=False)
    assert low in {r.file_id for r in rows}
    frag2 = translate_query("category:general", thresholds={})
    rows2 = search_files(conn, frag2.where, frag2.params, hydrate=False)
    assert low not in {r.file_id for r in rows2}


def test_bad_score_operator_rejected():
    from kobato_eyes_tpu.query.ast import ScoreExpr

    with pytest.raises(ValueError, match="score operator"):
        _compile(ScoreExpr(op="!=", threshold=0.5), "f", None)


def test_unknown_expression_rejected():
    with pytest.raises(TypeError, match="unhandled"):
        _compile(object(), "f", None)  # type: ignore[arg-type]
