"""Tagger postprocessing: device top-K, host category budgets.

Replicates the reference's optimized postprocess exactly
(``src/tagger/wd14_onnx.py:532-625`` and ``src/tagger/pixai_onnx.py:397-468``)
but moves the O(B*C) part — probability conversion, threshold masking, top-K —
onto the device where it fuses with the forward pass.  Only the final budget
walk over <=topk_cap candidates runs on host (tiny, name-mapping anyway).

Semantics preserved:
* sigmoid applied only when outputs look like logits (any value outside [0,1]);
* per-category threshold vector, unspecified categories -> 0.0, then a global
  score floor applied as max(threshold, floor);
* WD14: K = min(hits, base_cap, hard_cap) with base_cap = max(sum(limits), 64)
  when all categories are bounded, else no base cap; candidates are the top-K
  over threshold hits; greedy budget walk in score order;
* PixAI: candidates are per-category top-limit hits (minority categories
  survive the global top-K), character->copyright ("ips") score propagation,
  then the same greedy walk capped at hard_cap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kobato_eyes_tpu.models.base import (
    MaxTagsMap,
    TagCategory,
    TagPrediction,
    TagResult,
    ThresholdMap,
)
from kobato_eyes_tpu.models.labels import TagMeta

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------


def probs_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid-if-logits (reference wd14_onnx.py:546-548), batch-global test."""
    logits = logits.astype(jnp.float32)
    mn = jnp.min(logits)
    mx = jnp.max(logits)
    already_probs = (mn >= 0.0) & (mx <= 1.0)
    return jnp.where(already_probs, logits, jax.nn.sigmoid(logits))


@partial(jax.jit, static_argnames=("k",))
def topk_hits(probs: jnp.ndarray, thr_vec: jnp.ndarray, *, k: int):
    """(B, C) probs -> (scores, indices, hit_counts) of top-k threshold hits.

    Non-hits score -inf so the host can trim; k is the hard cap (static).
    """
    hit = probs >= thr_vec[None, :]
    masked = jnp.where(hit, probs, NEG_INF)
    scores, idx = jax.lax.top_k(masked, k)
    return scores, idx, jnp.sum(hit, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("caps",))
def topk_hits_by_category(
    probs: jnp.ndarray,
    thr_vec: jnp.ndarray,
    cat_vec: jnp.ndarray,
    *,
    caps: tuple[tuple[int, int], ...],
):
    """Per-category top-cap hits (PixAI candidate extraction).

    ``caps`` is a static tuple of (category, cap). Returns concatenated
    (scores, indices) with -inf padding — one fused kernel, no host loop
    over the (B, C) matrix.
    """
    hit = probs >= thr_vec[None, :]
    n_labels = probs.shape[1]
    parts_s = []
    parts_i = []
    for cat, cap in caps:
        mask = hit & (cat_vec[None, :] == cat)
        masked = jnp.where(mask, probs, NEG_INF)
        s, i = jax.lax.top_k(masked, min(cap, n_labels))
        parts_s.append(s)
        parts_i.append(i)
    return jnp.concatenate(parts_s, axis=1), jnp.concatenate(parts_i, axis=1)


# ---------------------------------------------------------------------------
# Host side (vectors prepared once per tagger)
# ---------------------------------------------------------------------------


def build_threshold_vector(
    cats: np.ndarray,
    thresholds: ThresholdMap,
    *,
    score_floor: float = 0.0,
) -> np.ndarray:
    """Per-label threshold vector (reference _build_threshold_vector +
    _with_score_floor): unspecified categories get 0.0, then the global floor."""
    vec = np.zeros(cats.shape[0], dtype=np.float32)
    for cat, thr in thresholds.items():
        vec[cats == int(cat)] = float(thr)
    if score_floor > 0.0:
        np.maximum(vec, score_floor, out=vec)
    return vec


def resolve_limits(
    defaults: MaxTagsMap | None, overrides: MaxTagsMap | None
) -> dict[int, int | None]:
    limits: dict[int, int | None] = {int(k): v for k, v in (defaults or {}).items()}
    for k, v in (overrides or {}).items():
        limits[int(k)] = v
    return limits


def _budget_walk(
    ordered: list[tuple[int, float]],
    cats: np.ndarray,
    names: list[str],
    limits: dict[int, int | None],
    hard_cap: int,
) -> TagResult:
    """Greedy score-order selection under per-category budgets."""
    taken: list[TagPrediction] = []
    per_cat: dict[int, int] = {}
    for idx, score in ordered:
        if len(taken) >= hard_cap:
            break
        cat = int(cats[idx])
        limit = limits.get(cat)
        used = per_cat.get(cat, 0)
        if limit is not None and used >= limit:
            continue
        per_cat[cat] = used + 1
        taken.append(TagPrediction(name=names[idx], score=float(score), category=TagCategory(cat)))
    return TagResult(tags=taken)


def select_wd14(
    scores: np.ndarray,  # (B, K) device top-k scores (-inf padded)
    indices: np.ndarray,  # (B, K)
    hit_counts: np.ndarray,  # (B,)
    *,
    cats: np.ndarray,
    names: list[str],
    limits: dict[int, int | None],
    hard_cap: int,
) -> list[TagResult]:
    """WD14 candidate truncation + budget walk (wd14_onnx.py:556-625)."""
    has_unbounded = any(v is None for v in limits.values())
    base_cap = (
        None
        if has_unbounded or not limits
        else max(sum(int(v) for v in limits.values() if v is not None), 64)
    )
    results: list[TagResult] = []
    for b in range(scores.shape[0]):
        hits = int(hit_counts[b])
        if hits == 0:
            results.append(TagResult(tags=[]))
            continue
        k = min(hits, hard_cap) if base_cap is None else min(hits, base_cap, hard_cap)
        row_s = scores[b]
        row_i = indices[b]
        ordered = [
            (int(row_i[j]), float(row_s[j])) for j in range(min(k, row_s.shape[0])) if np.isfinite(row_s[j])
        ]
        results.append(_budget_walk(ordered, cats, names, limits, hard_cap))
    return results


def select_pixai(
    scores: np.ndarray,  # (B, sumcaps) per-category top-cap scores (-inf padded)
    indices: np.ndarray,
    probs_rows: np.ndarray | None,  # (B, C) full prob rows for ips lookup (or None)
    *,
    cats: np.ndarray,
    names: list[str],
    limits: dict[int, int | None],
    hard_cap: int,
    cat_thresholds: ThresholdMap | None = None,
    score_floor: float = 0.0,
    tag_meta: dict[str, TagMeta] | None = None,
    name_to_idx: dict[str, int] | None = None,
) -> list[TagResult]:
    """PixAI selection: ips copyright merge, threshold re-check, budget walk
    (pixai_onnx.py:340-395)."""
    from kobato_eyes_tpu.models.labels import BROKEN_PLACEHOLDER_PREFIX

    thr_by_cat = {int(k): float(v) for k, v in (cat_thresholds or {}).items()}
    results: list[TagResult] = []
    for b in range(scores.shape[0]):
        merged: dict[str, tuple[float, int]] = {}
        for j in range(scores.shape[1]):
            s = float(scores[b, j])
            if not np.isfinite(s):
                continue
            idx = int(indices[b, j])
            name = names[idx]
            prev = merged.get(name)
            if prev is None or s > prev[0]:
                merged[name] = (s, int(cats[idx]))
        # character -> copyright propagation
        if tag_meta and name_to_idx is not None:
            for name, (score, cat) in list(merged.items()):
                if cat != int(TagCategory.CHARACTER):
                    continue
                meta = tag_meta.get(name)
                if not meta or not meta.ips:
                    continue
                for ip_name in meta.ips:
                    ip_score = score
                    ip_idx = name_to_idx.get(ip_name)
                    if probs_rows is not None and ip_idx is not None:
                        ip_score = max(ip_score, float(probs_rows[b, ip_idx]))
                    existing = merged.get(ip_name)
                    if existing is not None:
                        ip_score = max(ip_score, existing[0])
                    merged[ip_name] = (ip_score, int(TagCategory.COPYRIGHT))
        # Post-merge filtering (pixai_onnx.py:366-378): drop placeholder rows
        # and re-apply max(category threshold, floor) — ips-merged copyrights
        # may land below the copyright threshold.
        filtered: dict[str, tuple[float, int]] = {}
        for name, (score, cat) in merged.items():
            if name.startswith(BROKEN_PLACEHOLDER_PREFIX):
                continue
            if score < max(thr_by_cat.get(cat, 0.0), score_floor):
                continue
            filtered[name] = (score, cat)
        ordered_names = sorted(filtered.items(), key=lambda kv: (-kv[1][0], kv[0]))
        taken: list[TagPrediction] = []
        per_cat: dict[int, int] = {}
        for name, (score, cat) in ordered_names:
            if len(taken) >= hard_cap:
                break
            limit = limits.get(cat)
            used = per_cat.get(cat, 0)
            if limit is not None and used >= limit:
                continue
            per_cat[cat] = used + 1
            taken.append(TagPrediction(name=name, score=score, category=TagCategory(cat)))
        results.append(TagResult(tags=taken))
    return results


# ---------------------------------------------------------------------------
# numpy executable spec (parity tests compare device path against this)
# ---------------------------------------------------------------------------


def postprocess_np(
    logits: np.ndarray,
    thr_vec: np.ndarray,
    *,
    cats: np.ndarray,
    names: list[str],
    limits: dict[int, int | None],
    hard_cap: int,
) -> list[TagResult]:
    """Brute-force reimplementation of the WD14 postprocess for tests."""
    logits = logits.astype(np.float32)
    mn, mx = float(logits.min()), float(logits.max())
    probs = logits if (0.0 <= mn <= 1.0 and 0.0 <= mx <= 1.0) else 1.0 / (1.0 + np.exp(-logits))
    has_unbounded = any(v is None for v in limits.values())
    base_cap = (
        None
        if has_unbounded or not limits
        else max(sum(int(v) for v in limits.values() if v is not None), 64)
    )
    results = []
    for b in range(probs.shape[0]):
        row = probs[b]
        hit = row >= thr_vec
        hits = int(hit.sum())
        if hits == 0:
            results.append(TagResult(tags=[]))
            continue
        k = min(hits, hard_cap) if base_cap is None else min(hits, base_cap, hard_cap)
        masked = np.where(hit, row, -np.inf)
        order = np.argsort(-masked, kind="stable")[:k]
        ordered = [(int(i), float(masked[i])) for i in order if np.isfinite(masked[i])]
        results.append(_budget_walk(ordered, cats, names, limits, hard_cap))
    return results
