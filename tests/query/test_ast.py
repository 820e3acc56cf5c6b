"""Grammar tests mirroring the reference's query-parsing coverage."""

from __future__ import annotations

import pytest

from kobato_eyes_tpu.models.base import TagCategory
from kobato_eyes_tpu.query.ast import (
    AndExpr,
    CategoryExpr,
    NotExpr,
    OrExpr,
    ScoreExpr,
    TagExpr,
    extract_positive_tag_terms,
    parse_query,
)


def test_empty_query():
    assert parse_query("") is None
    assert parse_query("   ") is None


def test_single_tag():
    assert parse_query("1girl") == TagExpr("1girl")


def test_implicit_and_by_adjacency():
    expr = parse_query("a b c")
    assert expr == AndExpr(AndExpr(TagExpr("a"), TagExpr("b")), TagExpr("c"))


def test_or_lower_precedence_than_and():
    expr = parse_query("a b OR c")
    assert expr == OrExpr(AndExpr(TagExpr("a"), TagExpr("b")), TagExpr("c"))


def test_pipe_is_or():
    assert parse_query("a | b") == OrExpr(TagExpr("a"), TagExpr("b"))


def test_not_forms():
    assert parse_query("NOT a") == NotExpr(TagExpr("a"))
    assert parse_query("-a") == NotExpr(TagExpr("a"))
    assert parse_query("- a") == NotExpr(TagExpr("a"))
    assert parse_query("NOT NOT a") == NotExpr(NotExpr(TagExpr("a")))


def test_parens_grouping():
    expr = parse_query("a ( b OR c )")
    assert expr == AndExpr(TagExpr("a"), OrExpr(TagExpr("b"), TagExpr("c")))


def test_parens_in_tag_names_kept_whole():
    # A word containing both parens is a tag name, not a group.
    assert parse_query("character_(series)") == TagExpr("character_(series)")


def test_escaped_parens_unescape():
    assert parse_query(r"blue_\(eyes\)") == TagExpr("blue_(eyes)")


def test_negated_group():
    expr = parse_query("-( a b )")
    assert expr == NotExpr(AndExpr(TagExpr("a"), TagExpr("b")))


def test_category_term():
    expr = parse_query("category:character")
    assert expr == CategoryExpr(TagCategory.CHARACTER)
    with pytest.raises(ValueError):
        parse_query("category:bogus")


def test_score_terms():
    assert parse_query("score>=0.5") == ScoreExpr(">=", 0.5)
    assert parse_query("score<0.25") == ScoreExpr("<", 0.25)
    assert parse_query("SCORE=1") == ScoreExpr("=", 1.0)


def test_keywords_case_insensitive():
    expr = parse_query("a and b or c")
    assert expr == OrExpr(AndExpr(TagExpr("a"), TagExpr("b")), TagExpr("c"))


def test_unbalanced_paren_raises():
    with pytest.raises(ValueError):
        parse_query("( a b")


def test_unmatched_open_paren_without_close_is_tag_char():
    # "(" with no future ")" doesn't open a group (reference behavior).
    assert parse_query("(abc") == TagExpr("(abc")


def test_extract_positive_terms():
    assert extract_positive_tag_terms("A -b (c OR -d) NOT e") == ["a", "c"]
    assert extract_positive_tag_terms("x x X") == ["x"]
    assert extract_positive_tag_terms("-(a b)") == []
    assert extract_positive_tag_terms("NOT NOT a") == ["a"]
    assert extract_positive_tag_terms("category:general score>=0.5") == []
