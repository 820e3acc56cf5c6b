"""Multi-chip device query engine: file-row-sharded mask evaluation.

The SURVEY §2.3/§5 multi-chip search story (the reference scales its SQLite
search by throwing one big machine at it, ``src/db/repository.py:295-408``;
here the file axis shards over the mesh so HBM and mask work scale 1/D):

- The epoch's padded file-row axis splits contiguously over the mesh's
  ``data`` axis.  Each device holds ONLY its row-shard of the postings CSR
  (entries whose file row lands in the shard, still tag-major), the
  category/extrema panels, and evaluates the full query structure over its
  local rows with the same dynamic-slice + scatter kernel as the
  single-chip path (query/engine.py:_structure_fn).
- Per-shard CSR offsets differ, so the slot operand tables (starts, skips,
  lens, gates) ride in SHARDED (D, n_slots) arrays — each device reads its
  own row.  Slot buckets (static slice lengths) are the max over shards.
- The packed result mask comes back row-sharded (out_specs P(data)): the
  only cross-chip traffic is the n_pad/8-byte bitmask leaving the mesh.

Identity with the single-chip engine is exact (tests/query/
test_sharded_query.py asserts result-list equality): padding entries carry
``hit=False`` through the same guard math, and the host-side relevance /
ordering code is shared, not re-implemented.
"""

from __future__ import annotations

import os
import weakref
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kobato_eyes_tpu.parallel.mesh import DATA_AXIS

# epoch -> {mesh: _ShardedArrays}; weak keys so superseded epochs free their
# sharded device copies immediately (same policy as engine._COMPILED_CACHE)
_SHARDED_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

# (structure, buckets, D, rps, nnz_sh_pad) -> jitted shard_map evaluator
_SHARDED_STRUCTURE_CACHE: dict[tuple, object] = {}
_CACHE_CAP = 512


class _ShardedArrays:
    """Device-sharded epoch arrays + per-shard CSR offsets (host)."""

    __slots__ = (
        "mesh", "n_shards", "rps", "nnz_sh_pad",
        "rows_dev", "scores_dev", "local_nnz_dev",
        "cat_max_dev", "cat_present_dev", "smax_dev", "smin_dev",
        "offsets_sh", "row_base",
        "tables",  # (query, thr-key) -> sharded operand tables
    )


def _shard_epoch(epoch, mesh: Mesh) -> _ShardedArrays:
    per_epoch = _SHARDED_CACHE.setdefault(epoch, {})
    hit = per_epoch.get(mesh)
    if hit is not None:
        return hit

    d = int(mesh.shape[DATA_AXIS])
    n_pad = int(epoch.n_pad)
    if n_pad % d or (n_pad // d) % 32:
        raise ValueError(
            f"n_pad {n_pad} not shardable over {d} devices in 32-bit words"
        )
    rps = n_pad // d

    from kobato_eyes_tpu.query.engine import _pad_bucket

    t_count = epoch.num_tags
    counts = np.diff(epoch.offsets).astype(np.int64)
    t_idx = np.repeat(np.arange(t_count, dtype=np.int64), counts)
    rows = epoch.rows_np.astype(np.int64, copy=False)
    sc = epoch.scores_np.astype(np.float32)

    shard_of = rows // rps
    order = np.argsort(shard_of, kind="stable")  # tag-major within shard
    rows_s, sc_s, t_s, sh_s = rows[order], sc[order], t_idx[order], shard_of[order]
    per_shard_nnz = np.bincount(sh_s, minlength=d)
    nnz_sh_pad = _pad_bucket(int(per_shard_nnz.max()))
    # Skew policy: shard_map needs a rectangular (D, nnz_sh_pad) posting
    # table, so every shard pads to the BUSIEST shard's entry count.  Under a
    # pathological tag distribution (all postings landing in one row shard)
    # that multiplies device memory by up to D vs the single-chip layout.
    # Rather than silently paying it, refuse to shard when the padded total
    # exceeds ``amp_cap`` x the single-chip padded size — search_epoch catches
    # the ValueError, serves the query single-chip, and memoizes the verdict
    # for this (epoch, mesh).  tests/query/test_sharded_skew.py pins both the
    # balanced bound and the adversarial fallback.
    amp_cap = float(os.environ.get("KET_QUERY_SHARD_AMP_CAP", "4.0"))
    single_chip_pad = _pad_bucket(int(rows.shape[0]))
    # d * 256 is the minimum rectangular table ANY d-way sharding pays
    # (_pad_bucket floor), so tiny epochs are exempt — only genuine skew at
    # scale trips the cap.
    floor = max(single_chip_pad, d * 256)
    if d * nnz_sh_pad > amp_cap * floor:
        raise ValueError(
            f"tag-postings skew would amplify sharded memory "
            f"{d * nnz_sh_pad / single_chip_pad:.1f}x over single-chip "
            f"(cap {amp_cap:.1f}x, KET_QUERY_SHARD_AMP_CAP); busiest shard "
            f"holds {int(per_shard_nnz.max())} of {rows.shape[0]} postings"
        )

    rows_local = np.zeros((d, nnz_sh_pad), dtype=np.int32)
    scores_local = np.zeros((d, nnz_sh_pad), dtype=np.float32)
    offsets_sh = np.zeros((d, t_count + 1), dtype=np.int64)
    starts_sh = np.concatenate([[0], np.cumsum(per_shard_nnz)])
    for s in range(d):
        lo, hi = int(starts_sh[s]), int(starts_sh[s + 1])
        k = hi - lo
        rows_local[s, :k] = rows_s[lo:hi] - s * rps
        scores_local[s, :k] = sc_s[lo:hi]
        offsets_sh[s, 1:] = np.cumsum(np.bincount(t_s[lo:hi], minlength=t_count))

    sharded_rows = NamedSharding(mesh, P(DATA_AXIS, None))
    sharded_vec = NamedSharding(mesh, P(DATA_AXIS))

    out = _ShardedArrays()
    out.mesh = mesh
    out.n_shards = d
    out.rps = rps
    out.nnz_sh_pad = nnz_sh_pad
    out.rows_dev = jax.device_put(rows_local, sharded_rows)
    out.scores_dev = jax.device_put(scores_local, sharded_rows)
    out.local_nnz_dev = jax.device_put(
        per_shard_nnz.astype(np.int32), sharded_vec
    )
    # panels re-shard from the epoch's single-device copies (build-time cost)
    out.cat_max_dev = jax.device_put(epoch.cat_max_dev, sharded_rows)
    out.cat_present_dev = jax.device_put(epoch.cat_present_dev, sharded_rows)
    out.smax_dev = jax.device_put(epoch.smax_dev, sharded_vec)
    out.smin_dev = jax.device_put(epoch.smin_dev, sharded_vec)
    out.offsets_sh = offsets_sh
    out.row_base = rps * np.arange(d, dtype=np.int64)
    out.tables = {}
    per_epoch[mesh] = out
    return out


def _sharded_tables(sharded: _ShardedArrays, epoch, query: str, expr, thr):
    """Per-(query, thr) sharded slot operand tables (device-put once)."""
    key = (query, tuple(sorted(thr.items())))
    entry = sharded.tables.get(key)
    if entry is not None:
        return entry

    from kobato_eyes_tpu.query.engine import (
        _case_gate,
        _lower_structure,
        _pad_bucket,
    )

    slots: dict[str, int] = {}
    score_vals: list[float] = []
    structure = _lower_structure(expr, slots, score_vals)
    d, nnz_sh_pad = sharded.n_shards, sharded.nnz_sh_pad
    n_slots = len(slots)
    w = max(n_slots, 1)
    starts = np.zeros((d, w), dtype=np.int32)
    skips = np.zeros((d, w), dtype=np.int32)
    lens = np.zeros((d, w), dtype=np.int32)
    gates = np.zeros((d, w), dtype=np.float32)
    buckets = [8] * n_slots
    for name, k in slots.items():
        tid = epoch.name_to_tid.get(name)
        if tid is None:
            continue  # unknown tag: zero-length everywhere -> all-False mask
        gate = _case_gate(thr, int(epoch.tag_cats[tid]))
        max_len = 4
        for s in range(d):
            length = int(sharded.offsets_sh[s, tid + 1] - sharded.offsets_sh[s, tid])
            max_len = max(max_len, length)
        bucket = min(_pad_bucket(max_len), nnz_sh_pad)
        buckets[k] = bucket
        for s in range(d):
            lo = int(sharded.offsets_sh[s, tid])
            length = int(sharded.offsets_sh[s, tid + 1]) - lo
            start_c = min(lo, nnz_sh_pad - bucket)
            starts[s, k] = start_c
            skips[s, k] = lo - start_c
            lens[s, k] = length
            gates[s, k] = gate
    score_thr = np.asarray(score_vals or [0.0], dtype=np.float32)
    cat_gate = np.asarray([thr.get(c, 0.0) for c in range(6)], dtype=np.float32)
    sh = NamedSharding(sharded.mesh, P(DATA_AXIS, None))
    rep = NamedSharding(sharded.mesh, P())
    entry = (
        structure,
        tuple(buckets),
        jax.device_put(starts, sh),
        jax.device_put(skips, sh),
        jax.device_put(lens, sh),
        jax.device_put(gates, sh),
        jax.device_put(score_thr, rep),
        jax.device_put(cat_gate, rep),
    )
    if len(sharded.tables) >= _CACHE_CAP:
        for old in list(sharded.tables)[: _CACHE_CAP // 4]:
            del sharded.tables[old]
    sharded.tables[key] = entry
    return entry


def _sharded_structure_fn(structure: tuple, slot_buckets: tuple[int, ...],
                          mesh: Mesh, rps: int):
    key = (structure, slot_buckets, mesh, rps)
    fn = _SHARDED_STRUCTURE_CACHE.get(key)
    if fn is not None:
        return fn

    def body(rows2, scores2, local_nnz1, cat_max, cat_present, smax, smin,
             starts2, skips2, lens2, gates2, score_thr, cat_gate):
        # shard-local views (leading shard axis is size 1 inside shard_map)
        rows, scores = rows2[0], scores2[0]
        starts, skips = starts2[0], skips2[0]
        lens, gates = lens2[0], gates2[0]
        local_nnz = local_nnz1[0]
        term_masks = []
        for k, bucket in enumerate(slot_buckets):
            sl_rows = jax.lax.dynamic_slice(rows, (starts[k],), (bucket,))
            sl_scores = jax.lax.dynamic_slice(scores, (starts[k],), (bucket,))
            io_ = jax.lax.iota(jnp.int32, bucket)
            hit = (
                (io_ >= skips[k])
                & (io_ < skips[k] + lens[k])
                & (sl_scores >= gates[k])
            )
            term_masks.append(jnp.zeros(rps, dtype=bool).at[sl_rows].max(hit))

        # padding entries carry rows=0/score=0; the exact-equality scatter has
        # no slice guard (mirrors the single-chip kernel's dummy-row trick),
        # so validity comes from the per-shard entry count instead
        valid = jax.lax.iota(jnp.int32, rows.shape[0]) < local_nnz

        def ev(node: tuple) -> jnp.ndarray:
            kind = node[0]
            if kind == "all":
                return jnp.ones(rps, dtype=bool)
            if kind == "tag":
                return term_masks[node[1]]
            if kind == "cat":
                c = node[1]
                return cat_present[:, c] & (cat_max[:, c] >= cat_gate[c])
            if kind == "score":
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
                return jnp.zeros(rps, dtype=bool).at[rows].max(
                    (scores == t) & valid
                )
            if kind == "not":
                return ~ev(node[1])
            if kind == "and":
                return ev(node[1]) & ev(node[2])
            if kind == "or":
                return ev(node[1]) | ev(node[2])
            raise TypeError(f"unhandled structure node {node!r}")

        mask = ev(structure)
        w = mask.reshape(-1, 32).astype(jnp.uint32)
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
        return jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)

    row2 = P(DATA_AXIS, None)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            row2, row2, P(DATA_AXIS),  # rows, scores, local_nnz
            row2, row2, P(DATA_AXIS), P(DATA_AXIS),  # panels
            row2, row2, row2, row2,  # slot tables
            P(), P(),  # score_thr, cat_gate
        ),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    fn = jax.jit(mapped)
    if len(_SHARDED_STRUCTURE_CACHE) >= _CACHE_CAP:
        for old in list(_SHARDED_STRUCTURE_CACHE)[: _CACHE_CAP // 4]:
            del _SHARDED_STRUCTURE_CACHE[old]
    _SHARDED_STRUCTURE_CACHE[key] = fn
    return fn


def sharded_mask_words(epoch, mesh: Mesh, query: str, expr, thr: Mapping[int, float]) -> np.ndarray:
    """Packed (n_pad/32,) uint32 result-mask words, computed on the mesh."""
    sharded = _shard_epoch(epoch, mesh)
    (structure, buckets, starts_dev, skips_dev, lens_dev, gates_dev,
     score_dev, catgate_dev) = _sharded_tables(sharded, epoch, query, expr, thr)
    fn = _sharded_structure_fn(structure, buckets, mesh, sharded.rps)
    return np.asarray(
        fn(
            sharded.rows_dev, sharded.scores_dev, sharded.local_nnz_dev,
            sharded.cat_max_dev, sharded.cat_present_dev,
            sharded.smax_dev, sharded.smin_dev,
            starts_dev, skips_dev, lens_dev, gates_dev,
            score_dev, catgate_dev,
        )
    )
