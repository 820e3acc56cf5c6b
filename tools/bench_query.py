"""Query-engine latency benchmark: device posting lists vs SQL fallback.

BASELINE.md metric 3: query p50 latency (the reference published none, so
both backends are measured here under identical data and queries).

Builds a synthetic catalog (default 70k files, Zipf-ish tag distribution over
a 10k-tag vocabulary), snapshots it into a device epoch, then times a mixed
query workload on both backends.  Prints one JSON document.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


QUERY_WORKLOAD = [
    "tag_0",
    "tag_1 tag_3",
    "tag_0 OR tag_7",
    "tag_2 -tag_9",
    "( tag_1 OR tag_4 ) tag_0 -tag_50",
    "category:character",
    "category:character score>=0.5",
    "score>=0.9",
    "tag_12 AND NOT ( tag_30 OR tag_31 )",
    "unknown_tag OR tag_5",
]


def build_catalog(db_path: Path, n_files: int, n_tags: int, seed: int = 0) -> None:
    from kobato_eyes_tpu.db.connection import bootstrap
    from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
    from kobato_eyes_tpu.models.base import TagCategory

    rng = np.random.default_rng(seed)
    conn = bootstrap(db_path)
    try:
        cats = np.where(
            rng.random(n_tags) < 0.85, int(TagCategory.GENERAL),
            rng.choice([1, 2, 3, 4, 5], size=n_tags),
        )
        # Zipf-ish popularity: tag_k appears with prob ~ 1/(k+2)
        popularity = 1.0 / (np.arange(n_tags) + 2.0)
        popularity *= 30.0 / popularity.sum()  # ~30 tags/file on average

        items = []
        t0 = time.perf_counter()
        with conn:
            for i in range(n_files):
                fid = upsert_file(
                    conn, path=f"/bench/{i:07d}.png", size=1000 + i, mtime=1e9 + (i % 997)
                )
                hit = rng.random(n_tags) < popularity
                idx = np.nonzero(hit)[0]
                tags = [
                    (f"tag_{k}", float(rng.uniform(0.1, 1.0)), int(cats[k])) for k in idx
                ]
                items.append(TaggingItem(fid, tags, tagger_sig="bench"))
                if len(items) >= 2000:
                    write_tagging_batch(conn, items)
                    items.clear()
            if items:
                write_tagging_batch(conn, items)
        print(f"catalog built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    finally:
        conn.close()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--files", type=int, default=70_000)
    parser.add_argument("--tags", type=int, default=10_000)
    parser.add_argument("--repeats", type=int, default=20)
    parser.add_argument("--db", help="reuse an existing bench catalog")
    parser.add_argument(
        "--orders-only", action="store_true",
        help="skip the mixed workload; only time a broad query under every "
             "order_by (path-rank scaling proof: path must stay within 2x of "
             "mtime at 1M files)",
    )
    args = parser.parse_args(argv)

    from kobato_eyes_tpu.db.connection import bootstrap
    from kobato_eyes_tpu.db.repository import search_files
    from kobato_eyes_tpu.query.ast import extract_positive_tag_terms
    from kobato_eyes_tpu.query.engine import build_epoch, search_epoch
    from kobato_eyes_tpu.query.sql import normalize_thresholds, translate_query

    if args.db:
        db = Path(args.db)
        if not db.exists():
            build_catalog(db, args.files, args.tags)
    else:
        tmp = tempfile.mkdtemp(prefix="ket_bench_query_")
        db = Path(tmp) / "bench.sqlite"
        build_catalog(db, args.files, args.tags)

    conn = bootstrap(db)
    try:
        t0 = time.perf_counter()
        epoch = build_epoch(conn)
        build_s = time.perf_counter() - t0

        if args.orders_only:
            broad = "tag_0"  # most popular tag: ~half the catalog hits
            order_stats = {}
            for order in ("relevance", "mtime", "path", "id"):
                t0 = time.perf_counter()
                hits = search_epoch(epoch, broad, order_by=order, limit=200)
                warm_ms = (time.perf_counter() - t0) * 1000  # incl. rank build
                times = []
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    search_epoch(epoch, broad, order_by=order, limit=200)
                    times.append((time.perf_counter() - t0) * 1000)
                order_stats[order] = {
                    "p50_ms": round(float(np.percentile(times, 50)), 3),
                    "first_ms": round(warm_ms, 3),
                    "rows": len(hits),
                }
            print(json.dumps({
                "metric": "query_order_by_p50_ms",
                "files": args.files,
                "orders": order_stats,
                "path_vs_mtime": (
                    round(order_stats["path"]["p50_ms"] / order_stats["mtime"]["p50_ms"], 2)
                    if order_stats["mtime"]["p50_ms"] > 0 else None
                ),
            }))
            return 0

        thr = normalize_thresholds({})
        # warmup both backends
        for q in QUERY_WORKLOAD:
            search_epoch(epoch, q, limit=200)
            frag = translate_query(q, thresholds={})
            search_files(conn, frag.where, frag.params,
                         positive_tags=extract_positive_tag_terms(q),
                         thresholds=thr, limit=200, hydrate=False)

        device_ms: list[float] = []
        sql_ms: list[float] = []
        mismatch = 0
        for _ in range(args.repeats):
            for q in QUERY_WORKLOAD:
                t0 = time.perf_counter()
                dev = search_epoch(epoch, q, limit=200)
                device_ms.append((time.perf_counter() - t0) * 1000)
                frag = translate_query(q, thresholds={})
                t0 = time.perf_counter()
                sql = search_files(conn, frag.where, frag.params,
                                   positive_tags=extract_positive_tag_terms(q),
                                   thresholds=thr, limit=200, hydrate=False)
                sql_ms.append((time.perf_counter() - t0) * 1000)
                if [r.file_id for r in dev] != [r.file_id for r in sql]:
                    mismatch += 1
        assert mismatch == 0, f"{mismatch} backend mismatches"

        # --- batched multi-query dispatch (VERDICT r4 #4): the whole
        # workload in ONE call — same-structure queries share a vmapped
        # program, the batch syncs once; identity vs per-query asserted
        from kobato_eyes_tpu.query.engine import search_epoch_batch

        batched = search_epoch_batch(epoch, QUERY_WORKLOAD, limit=200)  # warm
        for q, rows in zip(QUERY_WORKLOAD, batched):
            solo = search_epoch(epoch, q, limit=200)
            assert [r.file_id for r in rows] == [r.file_id for r in solo], q
        batch_walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            search_epoch_batch(epoch, QUERY_WORKLOAD, limit=200)
            batch_walls.append((time.perf_counter() - t0) * 1000)
        batched_amortized_ms = float(np.percentile(batch_walls, 50)) / len(
            QUERY_WORKLOAD
        )

        # --- dispatch-only latency: chained mask dispatches, ONE sync —
        # the device-side cost with the host<->device round trip amortized
        # out (the "locally-attached single-digit ms" ledger row: through a
        # relay the RTT dominates p50; this is what remains without it)
        import jax

        from kobato_eyes_tpu.query.ast import parse_query
        from kobato_eyes_tpu.query.engine import _query_tables, _structure_fn

        thr_n = normalize_thresholds({})
        disp_ms: list[float] = []
        n_chain = 50
        for q in QUERY_WORKLOAD:
            expr = parse_query(q)
            tabs = _query_tables(epoch, q, expr, thr_n)
            fn = _structure_fn(tabs[0], tabs[1])
            fn_args = (
                epoch.rows_dev, epoch.scores_dev,
                epoch.cat_max_dev, epoch.cat_present_dev,
                epoch.smax_dev, epoch.smin_dev, *tabs[2:],
            )
            jax.block_until_ready(fn(*fn_args))  # warm
            t0 = time.perf_counter()
            outs = [fn(*fn_args) for _ in range(n_chain)]
            jax.block_until_ready(outs)
            disp_ms.append((time.perf_counter() - t0) * 1000 / n_chain)

        # post-epoch-swap cost: rebuild the epoch (fresh object, empty table
        # cache) and time the FIRST run of each query — with shape-generic
        # programs this is table upload only, not recompilation
        t0 = time.perf_counter()
        epoch2 = build_epoch(conn, version=2)
        swap_build_s = time.perf_counter() - t0
        first_ms: list[float] = []
        for q in QUERY_WORKLOAD:
            t0 = time.perf_counter()
            search_epoch(epoch2, q, limit=200)
            first_ms.append((time.perf_counter() - t0) * 1000)

        d = np.asarray(device_ms)
        s = np.asarray(sql_ms)
        f = np.asarray(first_ms)
        print(json.dumps({
            "metric": "query_p50_ms_70k",
            "value": round(float(np.percentile(d, 50)), 3),
            "unit": "ms",
            "vs_baseline": round(float(np.percentile(s, 50)) / float(np.percentile(d, 50)), 2),
            "files": args.files,
            "epoch_build_s": round(build_s, 2),
            "device_ms": {"p50": round(float(np.percentile(d, 50)), 3),
                          "p95": round(float(np.percentile(d, 95)), 3)},
            "sql_ms": {"p50": round(float(np.percentile(s, 50)), 3),
                       "p95": round(float(np.percentile(s, 95)), 3)},
            "batched_amortized_ms_per_query": round(batched_amortized_ms, 3),
            "dispatch_only_ms": {
                "p50": round(float(np.percentile(disp_ms, 50)), 3),
                "max": round(float(max(disp_ms)), 3),
            },
            "post_swap_first_query_ms": {
                "p50": round(float(np.percentile(f, 50)), 3),
                "max": round(float(f.max()), 3),
                "epoch_rebuild_s": round(swap_build_s, 2),
            },
        }))
    finally:
        conn.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
