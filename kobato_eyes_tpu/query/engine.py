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
from functools import cached_property
from typing import Mapping, Sequence

import jax
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


@dataclass(frozen=True, eq=False)  # identity hash/eq: used as a weak cache key
class TagIndexEpoch:
    """Immutable device snapshot of the (files x tags) score relation."""

    version: int
    # host-side file metadata (ordering + result assembly)
    file_ids: np.ndarray  # (N,) int64
    mtimes: np.ndarray  # (N,) float64
    sizes: np.ndarray  # (N,) int64
    paths: list[str]
    # tag vocabulary
    tag_names: list[str]
    tag_cats: np.ndarray  # (T,) int32
    name_to_tid: dict[str, int]
    # CSR postings, tag-major (device + host mirrors; the host copy serves
    # f64 relevance sums that must order exactly like SQLite's SUM).
    # Device arrays are PADDED to power-of-two buckets (pad entries scatter to
    # the dummy row n_pad-1 / dummy tag t_pad-1): a delta epoch with slightly
    # different sizes keeps the same padded shapes, so the shape-generic
    # query programs compiled for the previous epoch are reused as-is.
    offsets: np.ndarray  # (T+1,) int64, host
    rows_dev: jnp.ndarray  # (nnz_pad,) int32
    scores_dev: jnp.ndarray  # (nnz_pad,) float32
    rows_np: np.ndarray  # (nnz,) int32, host
    scores_np: np.ndarray  # (nnz,) float64, host
    # per-category panels (device, padded to n_pad rows)
    cat_max_dev: jnp.ndarray  # (n_pad, 6) float32, 0 where absent
    cat_present_dev: jnp.ndarray  # (n_pad, 6) bool
    # per-file score extrema over ALL postings (device, padded): answer
    # bare score>=/>/<=/< EXISTS terms without a 30M-entry scatter
    smax_dev: jnp.ndarray = None  # (n_pad,) float32, -inf where no postings
    smin_dev: jnp.ndarray = None  # (n_pad,) float32, +inf where no postings
    n_pad: int = 0
    t_pad: int = 0
    built_at: float = field(default_factory=time.time)

    @property
    def num_files(self) -> int:
        return len(self.file_ids)

    @cached_property
    def path_ranks(self) -> np.ndarray:
        """Order-isomorphic integer ranks of ``paths``.

        Lexsorting these equals lexsorting the raw strings (np U-dtype
        compares code points; SQLite BINARY collation is UTF-8 memcmp, and
        UTF-8 preserves code-point order) — same trick as the dup engine's
        sort keys.  Computed once per epoch on first path-ordered query;
        a 1M-file path ORDER BY then costs an int gather, not a
        per-hit Python list comprehension.  (cached_property writes
        straight into __dict__, so the frozen dataclass stays frozen; a
        concurrent double-compute is benign.)
        """
        return np.unique(np.asarray(self.paths), return_inverse=True)[1]

    @property
    def num_tags(self) -> int:
        return len(self.tag_names)

    @property
    def nnz(self) -> int:
        return int(self.offsets[-1]) if len(self.offsets) else 0


def _pad_bucket(x: int) -> int:
    """Smallest power of two strictly greater than ``x`` (min 256)."""
    return 1 << max(8, int(np.ceil(np.log2(max(int(x), 1) + 1))))


def _device_postings(
    r_idx: np.ndarray, sc: np.ndarray, t_idx: np.ndarray, n: int, t_count: int
) -> tuple[int, int, jnp.ndarray, jnp.ndarray]:
    """Pad postings to bucketed shapes and place on device.

    Padding entries point at the dummy row (n_pad-1 >= n) with score 0 so
    they can never contribute to a real file's mask.  Tag identity is
    positional (tag-major CSR + host ``offsets``); no per-entry tag-id array
    ships to the device — it would be a third of the upload and HBM for
    something no compiled program reads.
    """
    from kobato_eyes_tpu.utils.metrics import metrics

    nnz = len(r_idx)
    n_pad = _pad_bucket(n)
    t_pad = _pad_bucket(t_count)
    nnz_pad = _pad_bucket(nnz)
    # empty + slice-fill (a np.full over nnz_pad writes the whole 2x-padded
    # array twice; only the tail needs the dummy fill)
    rows = np.empty(nnz_pad, dtype=np.int32)
    rows[:nnz] = r_idx
    rows[nnz:] = n_pad - 1
    scores = np.empty(nnz_pad, dtype=np.float32)
    scores[:nnz] = sc
    scores[nnz:] = 0.0
    with metrics.timer("epoch.upload"):
        rows_dev = jnp.asarray(rows)
        scores_dev = jnp.asarray(scores)
        jax.block_until_ready((rows_dev, scores_dev))
    return n_pad, t_pad, rows_dev, scores_dev


def _pad_panels(
    cat_max_dev: jnp.ndarray, cat_present_dev: jnp.ndarray, n_pad: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    n = cat_max_dev.shape[0]
    if n == n_pad:
        return cat_max_dev, cat_present_dev
    pad = ((0, n_pad - n), (0, 0))
    return jnp.pad(cat_max_dev, pad), jnp.pad(cat_present_dev, pad)


def _pad_extrema(smax_dev: jnp.ndarray, smin_dev: jnp.ndarray, n_pad: int):
    n = smax_dev.shape[0]
    if n == n_pad:
        return smax_dev, smin_dev
    return (
        jnp.pad(smax_dev, (0, n_pad - n), constant_values=-jnp.inf),
        jnp.pad(smin_dev, (0, n_pad - n), constant_values=jnp.inf),
    )


def _assemble_epoch(
    *,
    version: int,
    file_ids: np.ndarray,
    mtimes: np.ndarray,
    sizes: np.ndarray,
    paths: list[str],
    tag_names: list[str],
    tag_cats: np.ndarray,
    t_idx: np.ndarray,  # (nnz,) tag row per entry
    r_idx: np.ndarray,  # (nnz,) file row per entry
    sc: np.ndarray,  # (nnz,) float32 scores
    presorted: bool = False,  # t_idx already tag-sorted (delta merge path)
    panels: tuple | None = None,  # precomputed device panels (cat + extrema)
) -> TagIndexEpoch:
    from kobato_eyes_tpu.utils.metrics import metrics

    if not presorted:
        with metrics.timer("epoch.sort"):
            order = np.argsort(t_idx, kind="stable")
            t_idx, r_idx, sc = t_idx[order], r_idx[order], sc[order]
    offsets = np.zeros(len(tag_names) + 1, dtype=np.int64)
    # bincount instead of np.add.at (ufunc.at is ~20x slower at 10M entries)
    counts = np.bincount(t_idx, minlength=len(tag_names))
    offsets[1:] = np.cumsum(counts)

    n = len(file_ids)
    if panels is not None:
        cat_max_dev, cat_present_dev, smax_dev, smin_dev = panels
    else:
        cat_max, cat_present, smax, smin = _category_panels(n, t_idx, r_idx, sc, tag_cats)
        cat_max_dev = jnp.asarray(cat_max)
        cat_present_dev = jnp.asarray(cat_present)
        smax_dev = jnp.asarray(smax)
        smin_dev = jnp.asarray(smin)

    n_pad, t_pad, rows_dev, scores_dev = _device_postings(
        r_idx.astype(np.int32, copy=False), sc.astype(np.float32), t_idx, n, len(tag_names)
    )
    cat_max_dev, cat_present_dev = _pad_panels(cat_max_dev, cat_present_dev, n_pad)
    smax_dev, smin_dev = _pad_extrema(smax_dev, smin_dev, n_pad)

    return TagIndexEpoch(
        version=version,
        file_ids=file_ids,
        mtimes=mtimes,
        sizes=sizes,
        paths=paths,
        tag_names=tag_names,
        tag_cats=tag_cats,
        name_to_tid={name: i for i, name in enumerate(tag_names)},
        offsets=offsets,
        rows_dev=rows_dev,
        scores_dev=scores_dev,
        rows_np=r_idx.astype(np.int32, copy=False),
        scores_np=sc.astype(np.float64, copy=False),
        cat_max_dev=cat_max_dev,
        cat_present_dev=cat_present_dev,
        smax_dev=smax_dev,
        smin_dev=smin_dev,
        n_pad=n_pad,
        t_pad=t_pad,
    )


def _category_panels(
    n: int,
    t_idx: np.ndarray,
    r_idx: np.ndarray,
    sc: np.ndarray,
    tag_cats: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-(file, category) max-score + presence panels, and per-file score
    extrema over ALL postings (smax/smin: bare score-term EXISTS semantics,
    category-independent)."""
    cat_max = np.zeros((n, _NUM_CATEGORIES), dtype=np.float32)
    cat_present = np.zeros((n, _NUM_CATEGORIES), dtype=bool)
    smax = np.full(n, -np.inf, dtype=np.float32)
    smin = np.full(n, np.inf, dtype=np.float32)
    if len(t_idx):
        cats_of_entries = tag_cats[t_idx]
        valid = (cats_of_entries >= 0) & (cats_of_entries < _NUM_CATEGORIES)
        # grouped max via sort + reduceat (np.maximum.at dominated 300k builds)
        cell = r_idx[valid].astype(np.int64) * _NUM_CATEGORIES + cats_of_entries[valid]
        sv = sc[valid].astype(np.float32)
        corder = np.argsort(cell, kind="stable")
        cell_s = cell[corder]
        sv_s = sv[corder]
        if len(cell_s):
            starts = np.concatenate([[0], np.nonzero(np.diff(cell_s))[0] + 1])
            maxima = np.maximum.reduceat(sv_s, starts)
            cells = cell_s[starts]
            cat_max.reshape(-1)[cells] = maxima
            cat_present.reshape(-1)[cells] = True
            # per-row extrema ride the same row-major order (cell // 6 = row)
            rows_s = (cell_s // _NUM_CATEGORIES).astype(np.int64)
            rstarts = np.concatenate([[0], np.nonzero(np.diff(rows_s))[0] + 1])
            rrows = rows_s[rstarts]
            smax[rrows] = np.maximum.reduceat(sv_s, rstarts)
            smin[rrows] = np.minimum.reduceat(sv_s, rstarts)
        if not valid.all():
            # out-of-range categories (never produced by this engine, but the
            # catalog is open): exact merge of the tiny invalid subset
            ri = r_idx[~valid]
            si = sc[~valid].astype(np.float32)
            np.maximum.at(smax, ri, si)
            np.minimum.at(smin, ri, si)
    return cat_max, cat_present, smax, smin


def _raw_cursor(conn: sqlite3.Connection) -> sqlite3.Cursor:
    """Cursor yielding plain tuples: sqlite3.Row item access costs ~5x more
    and dominates multi-million-row epoch fetches."""
    cur = conn.cursor()
    cur.row_factory = None  # type: ignore[assignment]
    return cur


# SQLite variable limit safety: IN(...) lists are chunked like
# db/repository._chunks so bulk retags of >900 files cannot blow the
# per-statement variable cap (999 on older builds).
_SQL_ID_CHUNK = 900


def _fetch_by_id_chunks(
    conn: sqlite3.Connection, sql_tmpl: str, ids: Sequence[int]
) -> list:
    """Run ``sql_tmpl.format(ph=...)`` over 900-id chunks, concatenating rows."""
    rows: list = []
    ids = list(ids)
    for start in range(0, len(ids), _SQL_ID_CHUNK):
        chunk = ids[start : start + _SQL_ID_CHUNK]
        ph = ",".join("?" * len(chunk))
        rows.extend(_raw_cursor(conn).execute(sql_tmpl.format(ph=ph), chunk).fetchall())
    return rows


def _db_file_path(conn: sqlite3.Connection) -> str | None:
    """Filesystem path of the main database, or None (e.g. :memory:)."""
    for _, name, path in conn.execute("PRAGMA database_list"):
        if name == "main":
            return path or None
    return None


def _fetch_file_tag_arrays_native(conn: sqlite3.Connection) -> tuple | None:
    """Full-table fetch through the C sqlite3 API (no per-row Python).

    The Python binding's fetchall creates one tuple per row — measured 32 s
    alone at 8.8M postings; the native walk is ~20x faster.  Reads on a
    separate READ-ONLY connection (committed state; epoch builds run under
    the single-writer discipline).  Returns None to fall back to the Python
    path (: memory: DBs, row-count race, missing toolchain).
    """
    import ctypes

    path = _db_file_path(conn)
    if not path:
        return None
    try:
        from kobato_eyes_tpu.native.build import load_native_library

        lib = load_native_library(
            "catalog_fetch", extra_link_args=("-l:libsqlite3.so.0",)
        )
    except Exception:  # noqa: BLE001 — native is an accelerator, never required
        logger.warning("native catalog fetch unavailable; using Python path", exc_info=True)
        return None
    fn = lib.ket_fetch_file_tags
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_double),
    ]
    (expected,) = conn.execute("SELECT COUNT(*) FROM file_tags").fetchone()
    cap = int(expected) + 1024  # slack for a concurrent commit; -4 => fallback
    fid = np.empty(cap, dtype=np.int64)
    tid = np.empty(cap, dtype=np.int64)
    sc = np.empty(cap, dtype=np.float64)
    n = fn(
        str(path).encode(), cap,
        fid.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        tid.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n < 0:
        logger.warning("native catalog fetch failed (rc=%d); using Python path", n)
        return None
    return fid[:n], tid[:n], sc[:n]


def _fetch_file_tag_arrays(
    conn: sqlite3.Connection, where: str = "", params: Sequence = ()
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """file_tags -> (file_id, tag_id, score) arrays without per-row Python."""
    # The side connection sees committed state only — stay on the Python
    # path while the caller holds an open transaction (its own uncommitted
    # writes must be visible to the build for consistency with the files/
    # tags reads above it).
    if not where and not conn.in_transaction:
        native = _fetch_file_tag_arrays_native(conn)
        if native is not None:
            return native
    rows = _raw_cursor(conn).execute(
        f"SELECT file_id, tag_id, score FROM file_tags {where}", list(params)
    ).fetchall()
    m = len(rows)
    fid = np.fromiter((r[0] for r in rows), dtype=np.int64, count=m)
    tid = np.fromiter((r[1] for r in rows), dtype=np.int64, count=m)
    # f64: the host copy must sum relevance exactly like SQLite's SUM
    sc = np.fromiter((r[2] for r in rows), dtype=np.float64, count=m)
    return fid, tid, sc


def _data_version(conn: sqlite3.Connection) -> int:
    """SQLite's cross-connection change counter (PRAGMA data_version) —
    bumps whenever ANOTHER connection commits, including the side connection
    used by the native catalog fetch's file."""
    return int(_raw_cursor(conn).execute("PRAGMA data_version").fetchone()[0])


def build_epoch(conn: sqlite3.Connection, *, version: int = 0) -> TagIndexEpoch:
    """Snapshot the catalog's present files into a device epoch.

    Epoch builds normally run under the single-writer discipline, but the
    native file_tags fetch reads the DB file on a separate connection —
    a writer committing between the files/tags reads and that fetch would
    yield a mixed-state epoch.  Detect it via PRAGMA data_version around
    the whole read set; on a detected concurrent commit, rebuild once
    inside a read transaction (Python fetch path), which WAL snapshots.
    """
    dv0 = _data_version(conn)
    epoch = _build_epoch_reads(conn, version=version)
    if _data_version(conn) == dv0:
        return epoch
    logger.warning(
        "concurrent commit detected during epoch build; retrying under a read transaction"
    )
    if conn.in_transaction:  # caller already holds a snapshot; keep theirs
        return _build_epoch_reads(conn, version=version)
    _raw_cursor(conn).execute("BEGIN")
    try:
        # any read inside the transaction pins the WAL snapshot; the Python
        # fetch path is used automatically (conn.in_transaction gate)
        return _build_epoch_reads(conn, version=version)
    finally:
        conn.rollback()


def _build_epoch_reads(conn: sqlite3.Connection, *, version: int) -> TagIndexEpoch:
    t0 = time.perf_counter()
    files = _raw_cursor(conn).execute(
        "SELECT id, path, mtime, size FROM files WHERE is_present = 1 ORDER BY id"
    ).fetchall()
    nf = len(files)
    file_ids = np.fromiter((r[0] for r in files), dtype=np.int64, count=nf)
    paths = [r[1] for r in files]
    mtimes = np.fromiter((r[2] or 0.0 for r in files), dtype=np.float64, count=nf)
    sizes_arr = np.fromiter((r[3] or 0 for r in files), dtype=np.int64, count=nf)

    tags = _raw_cursor(conn).execute(
        "SELECT id, name, category FROM tags ORDER BY id"
    ).fetchall()
    nt = len(tags)
    tag_db_ids = np.fromiter((r[0] for r in tags), dtype=np.int64, count=nt)
    tag_names = [r[1] for r in tags]
    tag_cats = np.fromiter((r[2] for r in tags), dtype=np.int32, count=nt)

    fid, tid_db, sc = _fetch_file_tag_arrays(conn)
    # vectorized id -> row mapping (both id arrays are sorted, unique)
    if nf and nt and len(fid):
        r_idx = np.searchsorted(file_ids, fid)
        t_idx = np.searchsorted(tag_db_ids, tid_db)
        valid = (r_idx < nf) & (t_idx < nt)
        valid &= file_ids[np.minimum(r_idx, nf - 1)] == fid
        valid &= tag_db_ids[np.minimum(t_idx, nt - 1)] == tid_db
    else:
        r_idx = np.zeros(0, dtype=np.int64)
        t_idx = np.zeros(0, dtype=np.int64)
        valid = np.zeros(len(fid), dtype=bool)[:0]
        fid, sc = fid[:0], sc[:0]
        valid = np.zeros(0, dtype=bool)

    epoch = _assemble_epoch(
        version=version, file_ids=file_ids, mtimes=mtimes, sizes=sizes_arr,
        paths=paths, tag_names=tag_names, tag_cats=tag_cats,
        t_idx=t_idx[valid], r_idx=r_idx[valid].astype(np.int32), sc=sc[valid],
    )
    logger.info(
        "epoch v%d built: files=%d tags=%d nnz=%d in %.3fs",
        version, nf, nt, int(valid.sum()), time.perf_counter() - t0,
    )
    return epoch


def update_epoch(
    conn: sqlite3.Connection,
    prev: TagIndexEpoch,
    *,
    changed_file_ids: Sequence[int],
    version: int,
) -> TagIndexEpoch:
    """Delta build: re-read only the changed/added/removed files.

    The incremental engine (SURVEY §7 step 7): postings of changed files are
    dropped from the previous CSR and re-fetched; files absent from the
    catalog (deleted / soft-deleted) leave the file axis.  New tags extend
    the vocabulary.  Cost scales with |changes| + nnz (one argsort), not
    with a full catalog re-read.
    """
    t0 = time.perf_counter()
    changed = np.unique(np.asarray(list(changed_file_ids), dtype=np.int64))

    # current state of the changed ids (which still exist & are present)
    cur_rows = _fetch_by_id_chunks(
        conn,
        "SELECT id, path, mtime, size FROM files WHERE is_present = 1 AND id IN ({ph})",
        changed.tolist(),
    ) if len(changed) else []
    alive = {int(r[0]): (r[1], float(r[2] or 0.0), int(r[3] or 0)) for r in cur_rows}

    # new file axis: previous files minus changed-and-gone, plus changed-and-alive
    prev_ids = prev.file_ids
    keep_mask = ~np.isin(prev_ids, changed)
    kept_ids = prev_ids[keep_mask]
    add_ids = np.array(sorted(alive), dtype=np.int64)
    file_ids = np.concatenate([kept_ids, add_ids])
    order = np.argsort(file_ids, kind="stable")
    file_ids = file_ids[order]

    # File metadata for the new axis, vectorized (a Python loop over the
    # full axis costs seconds at 300k files; every file is either kept from
    # prev or in the tiny `alive` set)
    n_new = len(file_ids)
    add_pos = np.searchsorted(file_ids, add_ids)
    kept_pos = np.ones(n_new, dtype=bool)
    kept_pos[add_pos] = False
    old_idx = np.searchsorted(prev_ids, file_ids[kept_pos])
    mtimes_all = np.empty(n_new, dtype=np.float64)
    sizes_all = np.empty(n_new, dtype=np.int64)
    paths_arr = np.empty(n_new, dtype=object)
    mtimes_all[kept_pos] = prev.mtimes[old_idx]
    sizes_all[kept_pos] = prev.sizes[old_idx]
    paths_arr[kept_pos] = np.asarray(prev.paths, dtype=object)[old_idx]
    if len(add_ids):
        meta = [alive[int(f)] for f in add_ids]
        paths_arr[add_pos] = [m[0] for m in meta]
        mtimes_all[add_pos] = [m[1] for m in meta]
        sizes_all[add_pos] = [m[2] for m in meta]
    paths_all = paths_arr.tolist()

    # refreshed tag vocabulary (append-only in practice)
    tags = _raw_cursor(conn).execute("SELECT id, name, category FROM tags ORDER BY id").fetchall()
    nt = len(tags)
    tag_db_ids = np.fromiter((r[0] for r in tags), dtype=np.int64, count=nt)
    tag_names = [r[1] for r in tags]
    tag_cats = np.fromiter((r[2] for r in tags), dtype=np.int32, count=nt)
    # previous tid -> new tid (names are unique and stable)
    name_pos = {n: i for i, n in enumerate(tag_names)}
    prev_tid_map = np.array([name_pos.get(n, -1) for n in prev.tag_names], dtype=np.int64)

    from kobato_eyes_tpu.utils.metrics import metrics as _metrics

    # Vocabulary append-only fast path: prior tags must map to identical new
    # tids AND keep their categories (the reused per-category panels bake the
    # old categories in); then surviving postings stay tag-sorted and new
    # postings MERGE in instead of globally re-sorting 10M+ entries.
    np_prev = len(prev_tid_map)
    vocab_append_only = (
        np_prev <= nt
        and bool((prev_tid_map == np.arange(np_prev)).all())
        and bool((tag_cats[:np_prev] == prev.tag_cats).all())
    )
    # Retag fast path: when no file entered or left the axis (the common
    # delta — tags changed in place), old row indices stay valid and the
    # 8.8M-entry row-remap gather is skipped entirely.
    same_file_axis = np.array_equal(file_ids, prev_ids)

    # surviving postings from the previous epoch (host mirrors keep f64).
    # Every pass below is O(nnz) on the host; the point of this section is
    # to do as FEW of those passes as possible (measured at 300k/8.8M nnz:
    # the merge, not the device upload, is the delta's cost).
    _t_merge = time.perf_counter()
    prev_rows = prev.rows_np
    prev_scores = prev.scores_np
    prev_tids = np.repeat(
        np.arange(prev.num_tags, dtype=np.int64), np.diff(prev.offsets)
    )
    surv_idx = np.flatnonzero(keep_mask[prev_rows])
    s_rows_old = prev_rows[surv_idx]
    s_sc = prev_scores[surv_idx]
    if vocab_append_only:
        s_t = prev_tids[surv_idx]  # identity tid map
    else:
        s_t = prev_tid_map[prev_tids[surv_idx]]
        ok_t = s_t >= 0
        s_rows_old, s_t, s_sc = s_rows_old[ok_t], s_t[ok_t], s_sc[ok_t]
    if same_file_axis:
        s_rows = s_rows_old  # already int32, rows unchanged
    else:
        old_to_new = np.searchsorted(file_ids, prev_ids).astype(np.int32)
        s_rows = old_to_new[s_rows_old]

    # fresh postings for the changed-and-alive files
    if len(add_ids):
        rows = _fetch_by_id_chunks(
            conn,
            "SELECT file_id, tag_id, score FROM file_tags WHERE file_id IN ({ph})",
            add_ids.tolist(),
        )
        m = len(rows)
        fid = np.fromiter((r[0] for r in rows), dtype=np.int64, count=m)
        tid_db = np.fromiter((r[1] for r in rows), dtype=np.int64, count=m)
        sc = np.fromiter((r[2] for r in rows), dtype=np.float64, count=m)
        n_rows = np.searchsorted(file_ids, fid).astype(np.int32)
        n_t = np.searchsorted(tag_db_ids, tid_db)
        if vocab_append_only:
            norder = np.argsort(n_t, kind="stable")
            n_t, n_rows, sc, fid = n_t[norder], n_rows[norder], sc[norder], fid[norder]
            # one shared destination map instead of three np.insert calls
            # (np.insert rebuilds its index bookkeeping per call)
            total = len(s_t) + m
            new_pos = np.searchsorted(s_t, n_t, side="right") + np.arange(m)
            old_pos_mask = np.ones(total, dtype=bool)
            old_pos_mask[new_pos] = False
            t_idx = np.empty(total, dtype=s_t.dtype)
            r_idx = np.empty(total, dtype=np.int32)
            scores = np.empty(total, dtype=np.float64)
            t_idx[new_pos] = n_t
            r_idx[new_pos] = n_rows
            scores[new_pos] = sc
            t_idx[old_pos_mask] = s_t
            r_idx[old_pos_mask] = s_rows
            scores[old_pos_mask] = s_sc
        else:
            t_idx = np.concatenate([s_t, n_t])
            r_idx = np.concatenate([s_rows, n_rows])
            scores = np.concatenate([s_sc, sc])
    else:
        t_idx, r_idx, scores = s_t, s_rows, s_sc

    _metrics.observe("epoch.delta.host_merge", time.perf_counter() - _t_merge)
    _t_panels = time.perf_counter()
    # Panels: gather unchanged rows from the previous epoch ON DEVICE, set
    # the changed/added rows from their (tiny) postings.
    panels = None
    if vocab_append_only:
        n_new = len(file_ids)
        new_to_old = np.searchsorted(prev_ids, file_ids)
        new_to_old = np.minimum(new_to_old, max(len(prev_ids) - 1, 0))
        from_prev = (
            (prev_ids[new_to_old] == file_ids) & ~np.isin(file_ids, add_ids)
            if len(prev_ids)
            else np.zeros(n_new, dtype=bool)
        )
        src = np.where(from_prev, new_to_old, 0).astype(np.int32)
        keep_dev = jnp.asarray(from_prev)
        keep_col = keep_dev[:, None]
        src_dev = jnp.asarray(src)
        cat_max_dev = jnp.where(keep_col, prev.cat_max_dev[src_dev], 0.0)
        cat_present_dev = jnp.where(keep_col, prev.cat_present_dev[src_dev], False)
        smax_dev = jnp.where(keep_dev, prev.smax_dev[src_dev], -jnp.inf)
        smin_dev = jnp.where(keep_dev, prev.smin_dev[src_dev], jnp.inf)
        if len(add_ids):
            # panels for just the added rows, computed densely on host
            add_rows_new = np.searchsorted(file_ids, add_ids)
            local = np.searchsorted(add_ids, fid).astype(np.int32)
            amax, apresent, asmax, asmin = _category_panels(
                len(add_ids), n_t, local, sc, tag_cats
            )
            add_dev = jnp.asarray(add_rows_new)
            cat_max_dev = cat_max_dev.at[add_dev].set(jnp.asarray(amax))
            cat_present_dev = cat_present_dev.at[add_dev].set(jnp.asarray(apresent))
            smax_dev = smax_dev.at[add_dev].set(jnp.asarray(asmax))
            smin_dev = smin_dev.at[add_dev].set(jnp.asarray(asmin))
        panels = (cat_max_dev, cat_present_dev, smax_dev, smin_dev)

    _metrics.observe("epoch.delta.panels", time.perf_counter() - _t_panels)
    _metrics.observe("epoch.delta.merge", time.perf_counter() - _t_merge)

    epoch = _assemble_epoch(
        version=version, file_ids=file_ids, mtimes=mtimes_all, sizes=sizes_all,
        paths=paths_all, tag_names=tag_names, tag_cats=tag_cats,
        t_idx=t_idx, r_idx=r_idx, sc=scores,
        presorted=vocab_append_only, panels=panels,
    )
    logger.info(
        "epoch v%d delta: files=%d (+%d changed) nnz=%d in %.3fs",
        version, len(file_ids), len(changed), len(t_idx), time.perf_counter() - t0,
    )
    return epoch


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


@dataclass
class DeviceSearchResult:
    file_id: int
    path: str
    mtime: float
    size: int
    relevance: float


_ORDERINGS = ("relevance", "mtime", "path", "id")

# epoch -> {(query, thr-key, positive): compiled eval}.  Weak keys: when an
# epoch is superseded its compiled closures (which capture the whole epoch's
# host+device arrays) must become collectable immediately.
import weakref

_COMPILED_CACHE: "weakref.WeakKeyDictionary[TagIndexEpoch, dict]" = weakref.WeakKeyDictionary()
# per-epoch set of mesh ids proven unshardable for it (see search_epoch)
_UNSHARDABLE_VERDICTS: "weakref.WeakKeyDictionary[TagIndexEpoch, set]" = (
    weakref.WeakKeyDictionary()
)
_PER_EPOCH_CACHE_CAP = 512

# structure -> jitted evaluator.  A "structure" is the query AST with tag
# names abstracted into slot indices and score thresholds into operand slots,
# so ONE compiled program serves every query of that shape on every epoch
# whose padded shapes match (epochs pad to buckets precisely for this).
_STRUCTURE_CACHE: dict[tuple, object] = {}


def _lower_structure(
    expr: Expr | None, slots: dict[str, int], score_vals: list[float]
) -> tuple:
    """AST -> hashable structure; collects tag slots and score thresholds."""
    if expr is None:
        return ("all",)
    if isinstance(expr, TagExpr):
        k = slots.setdefault(expr.name, len(slots))
        return ("tag", k)
    if isinstance(expr, CategoryExpr):
        return ("cat", int(expr.category))
    if isinstance(expr, ScoreExpr):
        score_vals.append(float(expr.threshold))
        return ("score", expr.op, len(score_vals) - 1)
    if isinstance(expr, NotExpr):
        return ("not", _lower_structure(expr.operand, slots, score_vals))
    if isinstance(expr, AndExpr):
        return (
            "and",
            _lower_structure(expr.left, slots, score_vals),
            _lower_structure(expr.right, slots, score_vals),
        )
    if isinstance(expr, OrExpr):
        return (
            "or",
            _lower_structure(expr.left, slots, score_vals),
            _lower_structure(expr.right, slots, score_vals),
        )
    raise TypeError(f"unhandled expression {expr!r}")


def _structure_body(structure: tuple, slot_buckets: tuple[int, ...]):
    """The raw (untransformed) mask evaluator for one query structure —
    jitted directly by :func:`_structure_fn`, vmapped over operand tables by
    :func:`_batched_structure_fn` (same trace, so single-query and batched
    results are identical by construction)."""

    def build(
        rows, scores, cat_max, cat_present, smax, smin,
        slot_starts, slot_skips, slot_lens, slot_gates, score_thr, cat_gate,
    ):
        npad = cat_max.shape[0]
        term_masks = []
        for k, bucket in enumerate(slot_buckets):
            sl_rows = jax.lax.dynamic_slice(rows, (slot_starts[k],), (bucket,))
            sl_scores = jax.lax.dynamic_slice(scores, (slot_starts[k],), (bucket,))
            io_ = jax.lax.iota(jnp.int32, bucket)
            hit = (
                (io_ >= slot_skips[k])
                & (io_ < slot_skips[k] + slot_lens[k])
                & (sl_scores >= slot_gates[k])
            )
            term_masks.append(jnp.zeros(npad, dtype=bool).at[sl_rows].max(hit))

        def ev(node: tuple) -> jnp.ndarray:
            kind = node[0]
            if kind == "all":
                return jnp.ones(npad, dtype=bool)
            if kind == "tag":
                return term_masks[node[1]]
            if kind == "cat":
                c = node[1]
                return cat_present[:, c] & (cat_max[:, c] >= cat_gate[c])
            if kind == "score":
                # bare score EXISTS term (sql.py: no category CASE): the
                # per-file extrema panels answer every inequality without a
                # full-postings scatter (30M+ entries at 1M files); exact
                # equality keeps the scatter formulation
                op, s_idx = node[1], node[2]
                t = score_thr[s_idx]
                if op == ">=":
                    return smax >= t
                if op == ">":
                    return smax > t
                if op == "<=":
                    return smin <= t
                if op == "<":
                    return smin < t
                return jnp.zeros(npad, dtype=bool).at[rows].max(scores == t)
            if kind == "not":
                return ~ev(node[1])
            if kind == "and":
                return ev(node[1]) & ev(node[2])
            if kind == "or":
                return ev(node[1]) | ev(node[2])
            raise TypeError(f"unhandled structure node {node!r}")

        mask = ev(structure)
        # pack to uint32 words: the result transfer is latency+bytes bound on
        # tunneled chips, and npad/8 bytes beats npad bools 8x
        w = mask.reshape(-1, 32).astype(jnp.uint32)
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
        return jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)

    return build


def _structure_fn(structure: tuple, slot_buckets: tuple[int, ...]):
    """Jitted mask evaluator for one query structure (shape-generic).

    Term postings are CONTIGUOUS slices of the tag-major CSR, so each term
    mask is a dynamic_slice (runtime start, static bucketed length) plus one
    small scatter — full-postings gathers/scatters cost ~50-90 ms at 2M
    entries on TPU, while slicing touches only the queried tags' entries.
    """
    key = (structure, slot_buckets)
    fn = _STRUCTURE_CACHE.get(key)
    if fn is not None:
        return fn

    fn = jax.jit(_structure_body(structure, slot_buckets))
    if len(_STRUCTURE_CACHE) >= _PER_EPOCH_CACHE_CAP:
        # bound the compiled-program cache: slot buckets track per-tag
        # posting lengths, so a long-lived serve process accumulates new
        # (structure, buckets) variants as the catalog grows.  Evict the
        # oldest quarter (dict insertion order) — a full clear() would
        # recompile every hot in-flight query shape at once.
        for old in list(_STRUCTURE_CACHE)[: max(1, _PER_EPOCH_CACHE_CAP // 4)]:
            del _STRUCTURE_CACHE[old]
    _STRUCTURE_CACHE[key] = fn
    return fn


def _unpack_mask(words: np.ndarray, n: int) -> np.ndarray:
    bits = (words[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    return bits.reshape(-1)[:n].astype(bool)


# (structure, buckets, Q) -> jitted vmapped evaluator for Q-query batches
_BATCHED_STRUCTURE_CACHE: dict[tuple, object] = {}


def _batched_structure_fn(structure: tuple, slot_buckets: tuple[int, ...], q: int):
    """One compiled program evaluating ``q`` same-structure queries at once.

    vmaps :func:`_structure_body` over the per-query operand tables (epoch
    arrays broadcast), so a serving batch pays ONE dispatch + ONE fetch
    instead of q round trips — through a relay the RTT is the p50 floor
    (VERDICT r4 #4).  ``q`` is part of the cache key; callers pad batches to
    power-of-two sizes to bound compile variants.
    """
    key = (structure, slot_buckets, q)
    fn = _BATCHED_STRUCTURE_CACHE.get(key)
    if fn is not None:
        return fn
    fn = jax.jit(
        jax.vmap(
            _structure_body(structure, slot_buckets),
            in_axes=(None, None, None, None, None, None, 0, 0, 0, 0, 0, 0),
        )
    )
    if len(_BATCHED_STRUCTURE_CACHE) >= _PER_EPOCH_CACHE_CAP:
        for old in list(_BATCHED_STRUCTURE_CACHE)[: max(1, _PER_EPOCH_CACHE_CAP // 4)]:
            del _BATCHED_STRUCTURE_CACHE[old]
    _BATCHED_STRUCTURE_CACHE[key] = fn
    return fn


def _slot_tables_np(
    epoch: TagIndexEpoch,
    expr: Expr | None,
    thr: dict[int, float],
):
    """Host-side slot operand tables for one query on one epoch.

    Returns (structure, buckets, starts, skips, lens, gates, score_thr,
    cat_gate) with numpy operands — :func:`_query_tables` device-puts them
    for the single-query path; :func:`search_epoch_batch` stacks them across
    same-structure queries for one vmapped dispatch.
    """
    slots: dict[str, int] = {}
    score_vals: list[float] = []
    structure = _lower_structure(expr, slots, score_vals)
    nnz_pad = int(epoch.rows_dev.shape[0])
    n_slots = len(slots)
    starts = np.zeros(max(n_slots, 1), dtype=np.int32)
    skips = np.zeros(max(n_slots, 1), dtype=np.int32)
    lens = np.zeros(max(n_slots, 1), dtype=np.int32)
    gates = np.zeros(max(n_slots, 1), dtype=np.float32)
    buckets = [8] * n_slots
    for name, k in slots.items():
        tid = epoch.name_to_tid.get(name)
        if tid is None:
            continue  # unknown tag: zero-length slice, mask stays all-False
        lo = int(epoch.offsets[tid])
        length = int(epoch.offsets[tid + 1]) - lo
        bucket = min(_pad_bucket(max(length, 4)), nnz_pad)
        start_c = min(lo, nnz_pad - bucket)
        buckets[k] = bucket
        starts[k] = start_c
        skips[k] = lo - start_c
        lens[k] = length
        gates[k] = _case_gate(thr, int(epoch.tag_cats[tid]))
    score_thr = np.asarray(score_vals or [0.0], dtype=np.float32)
    cat_gate = np.asarray(
        [thr.get(c, 0.0) for c in range(_NUM_CATEGORIES)], dtype=np.float32
    )
    return (
        structure, tuple(buckets), starts, skips, lens, gates, score_thr, cat_gate
    )


def _query_tables(
    epoch: TagIndexEpoch,
    query: str,
    expr: Expr | None,
    thr: dict[int, float],
):
    """Per-(epoch, query) device operand tables (uploaded once, reused).

    Returns (structure, buckets, starts/skips/lens/gates/score/catgate dev).
    """
    per_epoch = _COMPILED_CACHE.setdefault(epoch, {})
    key = (query, tuple(sorted(thr.items())))
    entry = per_epoch.get(key)
    if entry is not None:
        return entry

    (structure, buckets, starts, skips, lens, gates, score_thr, cat_gate) = (
        _slot_tables_np(epoch, expr, thr)
    )
    entry = (
        structure,
        buckets,
        jnp.asarray(starts),
        jnp.asarray(skips),
        jnp.asarray(lens),
        jnp.asarray(gates),
        jnp.asarray(score_thr),
        jnp.asarray(cat_gate),
    )
    if len(per_epoch) >= _PER_EPOCH_CACHE_CAP:
        # oldest-quarter eviction, same rationale as _STRUCTURE_CACHE
        for old in list(per_epoch)[: max(1, _PER_EPOCH_CACHE_CAP // 4)]:
            del per_epoch[old]
    per_epoch[key] = entry
    return entry


def _topk_select(cols: list[np.ndarray], k: int) -> np.ndarray:
    """Positions of the k smallest rows under lexicographic (cols[0], cols[1], ...).

    Exact (tie-correct) partial selection: argpartition on the primary key,
    keep everything strictly below the cutoff, recurse into the cutoff's tie
    set on the remaining keys.  With a unique final key (file ids) the
    recursion is finite.  Returns UNORDERED positions — the caller sorts the
    (<= k)-row survivor set; at 1M files / 700k hits this replaces a full
    3-key lexsort (the measured host floor) with O(n) partitions.
    """
    n = len(cols[0])
    if k >= n or not cols:
        return np.arange(n)
    sel = _topk_select_inner(cols, k)
    if len(sel) < k:
        # any NaN manifestation (NaN cutoff empties strict AND tied, NaN rows
        # vanish from both sides of the partition) shows up as a short result
        # — take the exact full-sort path rather than silently truncating
        return np.arange(n)
    return sel


def _topk_select_inner(cols: list[np.ndarray], k: int) -> np.ndarray:
    n = len(cols[0])
    if k >= n:
        return np.arange(n)
    c0 = cols[0]
    cutoff = c0[np.argpartition(c0, k - 1)[:k]].max()
    if np.isnan(cutoff):
        return np.arange(n)
    strict = np.nonzero(c0 < cutoff)[0]
    need = k - len(strict)
    if need <= 0:
        # more strictly-below rows than k can only happen with NaNs; fall back
        return np.arange(n)
    tied = np.nonzero(c0 == cutoff)[0]
    if len(tied) <= need or len(cols) == 1:
        take = tied[:need] if len(cols) == 1 and len(tied) > need else tied
        return np.concatenate([strict, take])
    sub = _topk_select_inner([c[tied] for c in cols[1:]], need)
    return np.concatenate([strict, tied[sub]])


# Hit sets smaller than this sort fully — partitions only pay off at scale.
_TOPK_MIN_HITS = 16384


def search_epoch(
    epoch: TagIndexEpoch,
    query: str,
    *,
    thresholds: Mapping[int, float] | None = None,
    order_by: str = "relevance",
    limit: int = 200,
    offset: int = 0,
    mesh=None,  # jax.sharding.Mesh: shard mask evaluation over its data axis
) -> list[DeviceSearchResult]:
    """Execute a query against the epoch; ordering parity with search_files."""
    if order_by not in _ORDERINGS:
        raise ValueError(f"order_by must be one of {_ORDERINGS}")
    expr = parse_query(query)
    thr = normalize_thresholds(thresholds or {})
    positive = (
        extract_positive_tag_terms(query) if order_by == "relevance" else []
    )
    mask = None
    if mesh is not None and int(mesh.shape.get("data", 1)) > 1:
        # multi-chip: file-row-sharded mask evaluation (query/sharded);
        # relevance + ordering below are shared host code, so identity with the
        # single-chip path is structural, not re-proved per feature
        from kobato_eyes_tpu.query.sharded import sharded_mask_words

        # memoized unshardable verdict: a persistently unshardable
        # (epoch, mesh) pair must not re-attempt sharding and re-warn on
        # every query of a hot serving path.  Keyed by epoch identity (weak,
        # like _COMPILED_CACHE) holding the mesh ids ruled out for it; a
        # recycled mesh id can at worst serve single-chip, never mis-answer.
        ruled_out = _UNSHARDABLE_VERDICTS.setdefault(epoch, set())
        if id(mesh) not in ruled_out:
            try:
                mask = _unpack_mask(
                    sharded_mask_words(epoch, mesh, query, expr, thr),
                    epoch.num_files,
                )
            except ValueError as exc:
                # e.g. a non-power-of-two data axis can't divide the padded
                # file rows: serve the query single-chip rather than failing
                logger.warning(
                    "mesh cannot shard this epoch (%s); single-chip "
                    "(verdict cached for this epoch+mesh)", exc,
                )
                ruled_out.add(id(mesh))
    if mask is None:
        # mask evaluation: one shape-generic program per query STRUCTURE (incl.
        # per-slot posting-length buckets), shared across epochs; operand tables
        # cached per (epoch, query)
        (structure, buckets, starts_dev, skips_dev, lens_dev, gates_dev,
         score_dev, catgate_dev) = _query_tables(epoch, query, expr, thr)
        fn = _structure_fn(structure, buckets)
        mask = _unpack_mask(
            np.asarray(
                fn(
                    epoch.rows_dev, epoch.scores_dev,
                    epoch.cat_max_dev, epoch.cat_present_dev,
                    epoch.smax_dev, epoch.smin_dev,
                    starts_dev, skips_dev, lens_dev, gates_dev,
                    score_dev, catgate_dev,
                )
            ),
            epoch.num_files,
        )
    return _rank_and_page(epoch, mask, positive, thr, order_by, limit, offset)


def _rank_and_page(
    epoch: TagIndexEpoch,
    mask: np.ndarray,
    positive: list[str],
    thr: dict[int, float],
    order_by: str,
    limit: int,
    offset: int,
) -> list[DeviceSearchResult]:
    """Shared host tail: relevance sum, ordering, paging, result assembly
    (identical for the single-chip, sharded, and batched mask paths)."""
    # relevance in host f64 — ordering must match SQLite's f64 SUM exactly.
    # One C-level bincount over the positives' postings (np.add.at per term
    # was the p50 floor at 300k files).
    rel = np.zeros(epoch.num_files, dtype=np.float64)
    if positive:
        row_parts: list[np.ndarray] = []
        sc_parts: list[np.ndarray] = []
        for name in positive:
            tid = epoch.name_to_tid.get(name)
            if tid is None:
                continue
            lo, hi = int(epoch.offsets[tid]), int(epoch.offsets[tid + 1])
            gate = _case_gate(thr, int(epoch.tag_cats[tid]))
            sc = epoch.scores_np[lo:hi]
            hit = sc >= gate
            row_parts.append(epoch.rows_np[lo:hi][hit])
            sc_parts.append(sc[hit])
        if row_parts:
            rel = np.bincount(
                np.concatenate(row_parts),
                weights=np.concatenate(sc_parts),
                minlength=epoch.num_files,
            )

    idx = np.nonzero(mask)[0]
    if idx.size == 0:
        return []
    k = offset + limit
    # large hit sets with a small page: exact partial top-k instead of a
    # full multi-key lexsort (the measured host floor at 1M files)
    partial_ok = (
        k > 0
        and idx.size > _TOPK_MIN_HITS
        and k * 4 < idx.size
    )
    if partial_ok:
        if order_by == "relevance":
            cols = [-rel[idx], -epoch.mtimes[idx], epoch.file_ids[idx]]
        elif order_by == "mtime":
            cols = [-epoch.mtimes[idx], epoch.file_ids[idx]]
        elif order_by == "path":
            cols = [epoch.path_ranks[idx], epoch.file_ids[idx]]
        else:
            cols = [epoch.file_ids[idx]]
        sel = _topk_select(cols, k)
        idx = idx[sel]
    if order_by == "relevance":
        order = np.lexsort((epoch.file_ids[idx], -epoch.mtimes[idx], -rel[idx].astype(np.float64)))
    elif order_by == "mtime":
        order = np.lexsort((epoch.file_ids[idx], -epoch.mtimes[idx]))
    elif order_by == "path":
        # integer ranks, order-isomorphic to the strings (see path_ranks)
        order = np.lexsort((epoch.file_ids[idx], epoch.path_ranks[idx]))
    else:
        order = np.argsort(epoch.file_ids[idx], kind="stable")
    chosen = idx[order][offset : offset + limit]
    return [
        DeviceSearchResult(
            file_id=int(epoch.file_ids[i]),
            path=epoch.paths[i],
            mtime=float(epoch.mtimes[i]),
            size=int(epoch.sizes[i]),
            relevance=float(rel[i]),
        )
        for i in chosen
    ]


def search_epoch_batch(
    epoch: TagIndexEpoch,
    queries: Sequence[str],
    *,
    thresholds: Mapping[int, float] | None = None,
    order_by: str = "relevance",
    limit: int = 200,
    offset: int = 0,
) -> list[list[DeviceSearchResult]]:
    """Execute many queries against the epoch with amortized dispatch.

    Same results as ``[search_epoch(epoch, q, ...) for q in queries]`` —
    the host ranking tail is shared code — but same-structure queries share
    ONE vmapped device program and the whole batch syncs ONCE: through a
    relay each ``search_epoch`` pays a full round trip (~the p50 floor),
    so a Q-query batch amortizes it Q-ways (VERDICT r4 #4; the reference
    serves chunked queries through one SQLite handle,
    ``src/ui/search_worker.py:103-141``).

    Single-chip path only (the sharded engine keeps per-query dispatch).
    """
    if order_by not in _ORDERINGS:
        raise ValueError(f"order_by must be one of {_ORDERINGS}")
    thr = normalize_thresholds(thresholds or {})

    # group by (structure, buckets): each group is one compiled program
    groups: dict[tuple, list[int]] = {}
    tables: list[tuple] = []
    positives: list[list[str]] = []
    for i, query in enumerate(queries):
        expr = parse_query(query)
        tabs = _slot_tables_np(epoch, expr, thr)
        tables.append(tabs)
        positives.append(
            extract_positive_tag_terms(query) if order_by == "relevance" else []
        )
        groups.setdefault((tabs[0], tabs[1]), []).append(i)

    pending: list[tuple[list[int], int, object]] = []
    for (structure, buckets), members in groups.items():
        q = len(members)
        # pad the batch to a power of two (first member duplicated) so the
        # compiled-variant count stays logarithmic in batch size
        q_pad = 1 << int(np.ceil(np.log2(max(q, 1))))
        rows_idx = members + members[: q_pad - q] if q_pad > q else members
        stacked = [
            np.stack([tables[i][j] for i in rows_idx]) for j in range(2, 8)
        ]
        fn = _batched_structure_fn(structure, buckets, q_pad)
        out = fn(
            epoch.rows_dev, epoch.scores_dev,
            epoch.cat_max_dev, epoch.cat_present_dev,
            epoch.smax_dev, epoch.smin_dev,
            *(jnp.asarray(s) for s in stacked),
        )
        pending.append((members, q, out))

    # ONE sync for every group's packed mask words
    fetched = jax.device_get([out for _, _, out in pending])
    results: list[list[DeviceSearchResult]] = [None] * len(tables)  # type: ignore[list-item]
    for (members, q, _), words in zip(pending, fetched):
        for row, i in enumerate(members[:q]):
            mask = _unpack_mask(np.asarray(words[row]), epoch.num_files)
            results[i] = _rank_and_page(
                epoch, mask, positives[i], thr, order_by, limit, offset
            )
    return results


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

    def apply_delta(
        self, conn: sqlite3.Connection, changed_file_ids: Sequence[int]
    ) -> TagIndexEpoch:
        """Incremental swap; falls back to a full rebuild when no epoch exists."""
        if self._epoch is None:
            return self.rebuild(conn)
        if not changed_file_ids:
            return self._epoch
        self._version += 1
        epoch = update_epoch(
            conn, self._epoch, changed_file_ids=changed_file_ids, version=self._version
        )
        self._epoch = epoch
        return epoch
