"""Device-resident tag index and query evaluator (the hot search path).

TPU-first re-design of the reference's SQLite/FTS5 search
(``src/db/repository.py:295-408`` + the EXISTS compilation of
``src/core/query.py:344-429``): instead of per-file EXISTS subqueries, tags
live on device as CSR posting lists (row indices + scores per tag) plus
per-category max-score panels.  A query AST evaluates bottom-up into dense
boolean masks over the N-file axis with vectorized VPU ops; relevance is a
masked score sum — semantics identical to the SQL backend, which the parity
tests enforce.

An epoch is an immutable snapshot: builds happen off to the side and swap
atomically (the reference's quiesce gate, re-imagined as versioned arrays).
"""

from __future__ import annotations

import logging
import sqlite3
import time
from dataclasses import dataclass, field
from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from kobato_eyes_tpu.models.base import TagCategory
from kobato_eyes_tpu.query.ast import (
    AndExpr,
    CategoryExpr,
    Expr,
    NotExpr,
    OrExpr,
    ScoreExpr,
    TagExpr,
    extract_positive_tag_terms,
    parse_query,
)
from kobato_eyes_tpu.query.sql import normalize_thresholds

logger = logging.getLogger(__name__)

_NUM_CATEGORIES = 6

# The SQL threshold CASE (query/sql.py _THRESHOLD_CASE) only branches on
# these categories; every other category takes the default (-1) threshold.
_CASED_CATEGORIES = frozenset(
    {int(TagCategory.GENERAL), int(TagCategory.CHARACTER), int(TagCategory.COPYRIGHT)}
)


def _case_gate(thr: dict[int, float], cat: int) -> float:
    if cat in _CASED_CATEGORIES:
        return thr.get(cat, 0.0)
    return thr.get(-1, 0.0)


@dataclass(frozen=True)
class TagIndexEpoch:
    """Immutable device snapshot of the (files x tags) score relation."""

    version: int
    # host-side file metadata (ordering + result assembly)
    file_ids: np.ndarray  # (N,) int64
    mtimes: np.ndarray  # (N,) float64
    paths: list[str]
    # tag vocabulary
    tag_names: list[str]
    tag_cats: np.ndarray  # (T,) int32
    name_to_tid: dict[str, int]
    # CSR postings, tag-major (device)
    offsets: np.ndarray  # (T+1,) int64, host
    rows_dev: jnp.ndarray  # (nnz,) int32
    scores_dev: jnp.ndarray  # (nnz,) float32
    # per-category panels (device)
    cat_max_dev: jnp.ndarray  # (N, 6) float32, 0 where absent
    cat_present_dev: jnp.ndarray  # (N, 6) bool
    built_at: float = field(default_factory=time.time)

    @property
    def num_files(self) -> int:
        return len(self.file_ids)

    @property
    def num_tags(self) -> int:
        return len(self.tag_names)

    @property
    def nnz(self) -> int:
        return int(self.offsets[-1]) if len(self.offsets) else 0


def build_epoch(conn: sqlite3.Connection, *, version: int = 0) -> TagIndexEpoch:
    """Snapshot the catalog's present files into a device epoch."""
    t0 = time.perf_counter()
    files = conn.execute(
        "SELECT id, path, mtime FROM files WHERE is_present = 1 ORDER BY id"
    ).fetchall()
    file_ids = np.array([int(r[0]) for r in files], dtype=np.int64)
    paths = [r[1] for r in files]
    mtimes = np.array([float(r[2] or 0.0) for r in files], dtype=np.float64)
    id_to_row = {fid: i for i, fid in enumerate(file_ids.tolist())}

    tags = conn.execute("SELECT id, name, category FROM tags ORDER BY id").fetchall()
    tag_names = [r[1] for r in tags]
    tag_cats = np.array([int(r[2]) for r in tags], dtype=np.int32)
    tid_by_db_id = {int(r[0]): i for i, r in enumerate(tags)}
    name_to_tid = {name: i for i, name in enumerate(tag_names)}

    ft = conn.execute("SELECT file_id, tag_id, score FROM file_tags").fetchall()
    nnz = len(ft)
    t_idx = np.empty(nnz, dtype=np.int64)
    r_idx = np.empty(nnz, dtype=np.int32)
    sc = np.empty(nnz, dtype=np.float32)
    k = 0
    for fid, tag_db_id, score in ft:
        row = id_to_row.get(int(fid))
        tid = tid_by_db_id.get(int(tag_db_id))
        if row is None or tid is None:
            continue
        t_idx[k] = tid
        r_idx[k] = row
        sc[k] = score
        k += 1
    t_idx, r_idx, sc = t_idx[:k], r_idx[:k], sc[:k]

    order = np.argsort(t_idx, kind="stable")
    t_idx, r_idx, sc = t_idx[order], r_idx[order], sc[order]
    offsets = np.zeros(len(tag_names) + 1, dtype=np.int64)
    np.add.at(offsets, t_idx + 1, 1)
    np.cumsum(offsets, out=offsets)

    n = len(file_ids)
    cat_max = np.zeros((n, _NUM_CATEGORIES), dtype=np.float32)
    cat_present = np.zeros((n, _NUM_CATEGORIES), dtype=bool)
    if k:
        cats_of_entries = tag_cats[t_idx]
        valid = (cats_of_entries >= 0) & (cats_of_entries < _NUM_CATEGORIES)
        np.maximum.at(cat_max, (r_idx[valid], cats_of_entries[valid]), sc[valid])
        cat_present[r_idx[valid], cats_of_entries[valid]] = True

    epoch = TagIndexEpoch(
        version=version,
        file_ids=file_ids,
        mtimes=mtimes,
        paths=paths,
        tag_names=tag_names,
        tag_cats=tag_cats,
        name_to_tid=name_to_tid,
        offsets=offsets,
        rows_dev=jnp.asarray(r_idx),
        scores_dev=jnp.asarray(sc),
        cat_max_dev=jnp.asarray(cat_max),
        cat_present_dev=jnp.asarray(cat_present),
    )
    logger.info(
        "epoch v%d built: files=%d tags=%d nnz=%d in %.3fs",
        version, n, len(tag_names), k, time.perf_counter() - t0,
    )
    return epoch


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _tag_postings(epoch: TagIndexEpoch, tid: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    lo, hi = int(epoch.offsets[tid]), int(epoch.offsets[tid + 1])
    return epoch.rows_dev[lo:hi], epoch.scores_dev[lo:hi]


def _eval(expr: Expr, epoch: TagIndexEpoch, thr: dict[int, float] | None) -> jnp.ndarray:
    """AST -> (N,) bool mask on device."""
    n = epoch.num_files
    if isinstance(expr, TagExpr):
        tid = epoch.name_to_tid.get(expr.name)
        if tid is None:
            return jnp.zeros(n, dtype=bool)
        rows, scores = _tag_postings(epoch, tid)
        if thr is None:
            hits = jnp.ones_like(scores, dtype=bool)
        else:
            hits = scores >= _case_gate(thr, int(epoch.tag_cats[tid]))
        return jnp.zeros(n, dtype=bool).at[rows].max(hits)
    if isinstance(expr, CategoryExpr):
        cat = int(expr.category)
        present = epoch.cat_present_dev[:, cat]
        if thr is None:
            return present
        gate = thr.get(cat, 0.0)
        return present & (epoch.cat_max_dev[:, cat] >= gate)
    if isinstance(expr, ScoreExpr):
        s = epoch.scores_dev
        t = jnp.float32(expr.threshold)
        pred = {
            ">=": s >= t, "<=": s <= t, "=": s == t, ">": s > t, "<": s < t,
        }[expr.op]
        return jnp.zeros(n, dtype=bool).at[epoch.rows_dev].max(pred)
    if isinstance(expr, NotExpr):
        return ~_eval(expr.operand, epoch, thr)
    if isinstance(expr, AndExpr):
        return _eval(expr.left, epoch, thr) & _eval(expr.right, epoch, thr)
    if isinstance(expr, OrExpr):
        return _eval(expr.left, epoch, thr) | _eval(expr.right, epoch, thr)
    raise TypeError(f"unhandled expression {expr!r}")


def _relevance(
    epoch: TagIndexEpoch, positive_tags: Sequence[str], thr: dict[int, float]
) -> jnp.ndarray:
    """Masked score sum over positive tags (reference repository.py:317-337).

    Tag-name matching is exact like the SQL ``t.name IN (...)`` (SQLite
    default BINARY collation); names arrive lowercased from the extractor.
    """
    rel = jnp.zeros(epoch.num_files, dtype=jnp.float32)
    for name in positive_tags:
        tid = epoch.name_to_tid.get(name)
        if tid is None:
            continue
        rows, scores = _tag_postings(epoch, tid)
        gate = _case_gate(thr, int(epoch.tag_cats[tid]))
        rel = rel.at[rows].add(jnp.where(scores >= gate, scores, 0.0))
    return rel


@dataclass
class DeviceSearchResult:
    file_id: int
    path: str
    mtime: float
    relevance: float


_ORDERINGS = ("relevance", "mtime", "path", "id")


def search_epoch(
    epoch: TagIndexEpoch,
    query: str,
    *,
    thresholds: Mapping[int, float] | None = None,
    order_by: str = "relevance",
    limit: int = 200,
    offset: int = 0,
) -> list[DeviceSearchResult]:
    """Execute a query against the epoch; ordering parity with search_files."""
    if order_by not in _ORDERINGS:
        raise ValueError(f"order_by must be one of {_ORDERINGS}")
    expr = parse_query(query)
    thr = normalize_thresholds(thresholds or {})
    if expr is None:
        mask = np.ones(epoch.num_files, dtype=bool)
    else:
        mask = np.asarray(_eval(expr, epoch, thr))

    positive = extract_positive_tag_terms(query)
    if positive and order_by == "relevance":
        rel = np.asarray(_relevance(epoch, positive, thr))
    else:
        rel = np.zeros(epoch.num_files, dtype=np.float32)

    idx = np.nonzero(mask)[0]
    if idx.size == 0:
        return []
    if order_by == "relevance":
        order = np.lexsort((epoch.file_ids[idx], -epoch.mtimes[idx], -rel[idx].astype(np.float64)))
    elif order_by == "mtime":
        order = np.lexsort((epoch.file_ids[idx], -epoch.mtimes[idx]))
    elif order_by == "path":
        order = np.lexsort((epoch.file_ids[idx], np.array([epoch.paths[i] for i in idx])))
    else:
        order = np.argsort(epoch.file_ids[idx], kind="stable")
    chosen = idx[order][offset : offset + limit]
    return [
        DeviceSearchResult(
            file_id=int(epoch.file_ids[i]),
            path=epoch.paths[i],
            mtime=float(epoch.mtimes[i]),
            relevance=float(rel[i]),
        )
        for i in chosen
    ]


# ---------------------------------------------------------------------------
# epoch manager (quiesce analog: build aside, swap atomically)
# ---------------------------------------------------------------------------


class EpochManager:
    """Holds the live epoch; rebuilds produce a new version then swap."""

    def __init__(self) -> None:
        self._epoch: TagIndexEpoch | None = None
        self._version = 0

    @property
    def current(self) -> TagIndexEpoch | None:
        return self._epoch

    def rebuild(self, conn: sqlite3.Connection) -> TagIndexEpoch:
        self._version += 1
        epoch = build_epoch(conn, version=self._version)
        self._epoch = epoch  # atomic reference swap; old readers keep theirs
        return epoch
