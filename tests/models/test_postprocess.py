"""Device postprocess parity against the numpy executable spec."""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from kobato_eyes_tpu.models.base import TagCategory
from kobato_eyes_tpu.models.labels import TagMeta, synthetic_labels
from kobato_eyes_tpu.models.postprocess import (
    build_threshold_vector,
    postprocess_np,
    probs_from_logits,
    select_pixai,
    select_wd14,
    topk_hits,
    topk_hits_by_category,
)


def _labels(n=300):
    labels = synthetic_labels(n)
    cats = np.array([int(m.category) for m in labels], dtype=np.int32)
    names = [m.name for m in labels]
    return labels, cats, names


def test_probs_from_logits_passthrough_and_sigmoid():
    probs = np.random.default_rng(0).uniform(0, 1, (4, 16)).astype(np.float32)
    out = np.asarray(probs_from_logits(jnp.asarray(probs)))
    np.testing.assert_allclose(out, probs, rtol=1e-6)

    logits = np.random.default_rng(1).normal(0, 3, (4, 16)).astype(np.float32)
    out = np.asarray(probs_from_logits(jnp.asarray(logits)))
    np.testing.assert_allclose(out, 1 / (1 + np.exp(-logits)), rtol=1e-5)


@pytest.mark.parametrize("limits", [
    {},
    {0: 5, 4: 2, 3: 2, 1: None},
    {0: 100, 4: 3, 3: 3, 2: 1, 5: 2},
])
def test_wd14_selection_matches_numpy_spec(limits):
    _, cats, names = _labels()
    rng = np.random.default_rng(42)
    # Feed probabilities directly (sigmoid is identity-checked elsewhere) so
    # host and device see bit-identical f32 inputs; this pins the *selection*
    # semantics, which is the parity target.
    logits = rng.uniform(0.0, 1.0, (6, len(names))).astype(np.float32)

    thr_vec = build_threshold_vector(cats, {0: 0.35, 4: 0.25, 3: 0.25}, score_floor=0.1)
    expected = postprocess_np(logits, thr_vec, cats=cats, names=names, limits=limits, hard_cap=128)

    probs = probs_from_logits(jnp.asarray(logits))
    scores, idx, hits = topk_hits(probs, jnp.asarray(thr_vec), k=128)
    got = select_wd14(
        np.asarray(scores), np.asarray(idx), np.asarray(hits),
        cats=cats, names=names, limits=limits, hard_cap=128,
    )
    for e, g in zip(expected, got):
        assert [(t.name, t.category) for t in e.tags] == [(t.name, t.category) for t in g.tags]
        np.testing.assert_allclose(
            [t.score for t in e.tags], [t.score for t in g.tags], rtol=1e-6
        )


def test_wd14_no_hits_yields_empty():
    _, cats, names = _labels(50)
    probs = jnp.zeros((2, 50), jnp.float32)
    thr = build_threshold_vector(cats, {0: 0.5}, score_floor=0.4)
    scores, idx, hits = topk_hits(probs, jnp.asarray(thr), k=50)
    got = select_wd14(np.asarray(scores), np.asarray(idx), np.asarray(hits),
                      cats=cats, names=names, limits={}, hard_cap=128)
    assert all(not r.tags for r in got)


def test_pixai_minority_categories_survive():
    """Characters above threshold must appear even when general tags dominate."""
    labels, cats, names = _labels(400)
    probs = np.full((1, 400), 0.55, dtype=np.float32)  # every general tag hits
    char_idx = np.nonzero(cats == int(TagCategory.CHARACTER))[0][:3]
    probs[0, char_idx] = 0.85
    thr_vec = build_threshold_vector(cats, {0: 0.4, 4: 0.8, 3: 0.8}, score_floor=0.1)
    limits = {0: 128, 4: 10, 3: 10}

    caps = tuple(
        (c, min(limits.get(c, 128) or 128, 128))
        for c in sorted(set(int(x) for x in np.unique(cats)))
    )
    scores, idx = topk_hits_by_category(
        jnp.asarray(probs), jnp.asarray(thr_vec), jnp.asarray(cats), caps=caps
    )
    got = select_pixai(
        np.asarray(scores), np.asarray(idx), None,
        cats=cats, names=names, limits=limits, hard_cap=128,
        cat_thresholds={0: 0.4, 4: 0.8, 3: 0.8}, score_floor=0.1,
    )
    got_names = {t.name for t in got[0].tags}
    for i in char_idx:
        assert names[i] in got_names
    # hard cap respected
    assert len(got[0].tags) <= 128


def test_pixai_ips_propagation():
    labels = [
        TagMeta("some_character", TagCategory.CHARACTER, ips=("some_franchise",)),
        TagMeta("some_franchise", TagCategory.COPYRIGHT),
        TagMeta("unrelated", TagCategory.GENERAL),
    ]
    cats = np.array([int(m.category) for m in labels], dtype=np.int32)
    names = [m.name for m in labels]
    probs = np.array([[0.95, 0.10, 0.5]], dtype=np.float32)
    thr_vec = build_threshold_vector(cats, {0: 0.4, 4: 0.8, 3: 0.8})
    caps = ((0, 128), (3, 10), (4, 10))
    scores, idx = topk_hits_by_category(
        jnp.asarray(probs), jnp.asarray(thr_vec), jnp.asarray(cats), caps=caps
    )
    got = select_pixai(
        np.asarray(scores), np.asarray(idx), probs,
        cats=cats, names=names, limits={0: 128, 4: 10, 3: 10}, hard_cap=128,
        cat_thresholds={0: 0.4, 4: 0.8, 3: 0.8}, score_floor=0.1,
        tag_meta={m.name: m for m in labels},
        name_to_idx={m.name: i for i, m in enumerate(labels)},
    )
    by_name = {t.name: t for t in got[0].tags}
    assert "some_character" in by_name
    # copyright inherited the character's score (0.95 > its raw 0.10)
    assert "some_franchise" in by_name
    assert by_name["some_franchise"].score == pytest.approx(0.95)
    assert by_name["some_franchise"].category == TagCategory.COPYRIGHT


def test_pixai_budget_cap_and_placeholder_drop():
    """Per-category budgets skip overflow tags by score order, the hard cap
    truncates, and __pixai_broken placeholders never surface
    (pixai_onnx.py:366-436 policy)."""
    from kobato_eyes_tpu.models.labels import BROKEN_PLACEHOLDER_PREFIX

    labels = [
        TagMeta("g1", TagCategory.GENERAL),
        TagMeta("g2", TagCategory.GENERAL),
        TagMeta("g3", TagCategory.GENERAL),
        TagMeta(f"{BROKEN_PLACEHOLDER_PREFIX}7", TagCategory.GENERAL),
        TagMeta("c1", TagCategory.CHARACTER),
        TagMeta("c2", TagCategory.CHARACTER),
    ]
    cats = np.array([int(m.category) for m in labels], dtype=np.int32)
    names = [m.name for m in labels]
    # scores descend g1 > g2 > g3; placeholder scores highest of all;
    # both characters above their threshold
    probs = np.array([[0.9, 0.8, 0.7, 0.99, 0.95, 0.93]], dtype=np.float32)
    thr = {0: 0.4, 4: 0.8, 3: 0.8}
    thr_vec = build_threshold_vector(cats, thr, score_floor=0.1)
    caps = ((0, 128), (4, 10))
    scores, idx = topk_hits_by_category(
        jnp.asarray(probs), jnp.asarray(thr_vec), jnp.asarray(cats), caps=caps
    )
    got = select_pixai(
        np.asarray(scores), np.asarray(idx), probs,
        cats=cats, names=names, limits={0: 2, 4: 1}, hard_cap=3,
        cat_thresholds=thr, score_floor=0.1,
        tag_meta={m.name: m for m in labels},
        name_to_idx={m.name: i for i, m in enumerate(labels)},
    )
    tags = got[0].tags
    got_names = [t.name for t in tags]
    assert all(not n.startswith("__") for n in got_names)  # placeholder gone
    assert got_names.count("c2") == 0  # character budget of 1: best only
    assert "c1" in got_names
    assert len([n for n in got_names if n.startswith("g")]) <= 2  # general cap
    assert len(tags) <= 3  # hard cap
