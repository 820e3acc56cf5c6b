"""Tagger throughput benchmark (reference ``tools/bench.py tagger`` parity).

Measures end-to-end images/sec through the prefetch loader + jitted tagger
forward + postprocess, excluding the warmup batch, and reports p50/p95 of
per-batch device and postprocess time — the same shape as the reference's
log-scraped summary (tools/bench.py:59-117).

Usage:
    python tools/bench_tagger.py --synthetic 512 --batch-size 32
    python tools/bench_tagger.py --images /path/to/dir --tagger wd14
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _percentiles(values: list[float]) -> dict[str, float]:
    if not values:
        return {"p50": 0.0, "p95": 0.0, "mean": 0.0}
    arr = np.asarray(values)
    return {
        "p50": float(np.percentile(arr, 50)),
        "p95": float(np.percentile(arr, 95)),
        "mean": float(arr.mean()),
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", help="directory of real images")
    parser.add_argument("--synthetic", type=int, default=0, help="use N synthetic images")
    parser.add_argument("--tagger", choices=["wd14", "pixai"], default="wd14")
    parser.add_argument("--preset", default="base", help="ViT preset (tiny/small/base/large)")
    parser.add_argument("--labels", type=int, default=8192)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--image-size", type=int, default=448)
    parser.add_argument("--warmup-batches", type=int, default=1)
    parser.add_argument(
        "--bf16-params", action="store_true",
        help="inference-only bf16 weights (no per-layer cast fusions)",
    )
    parser.add_argument(
        "--profile",
        metavar="DIR",
        help="capture a jax.profiler device trace of the timed loop into DIR",
    )
    args = parser.parse_args(argv)

    from kobato_eyes_tpu.models.labels import synthetic_labels
    from kobato_eyes_tpu.models.tagger import PixaiTagger, WD14Tagger
    from kobato_eyes_tpu.models.vit import vit_config

    if args.tagger == "pixai" and args.labels == 8192:
        args.labels = 13461  # reference PixAI label count (model_inspection.py:15)

    cls = WD14Tagger if args.tagger == "wd14" else PixaiTagger
    tagger = cls(
        labels=synthetic_labels(args.labels),
        vit=vit_config(args.preset, image_size=args.image_size, num_classes=args.labels),
        image_size=args.image_size,
        bf16_params=args.bf16_params,
    )

    # ---- inputs: fixed order (reference bench uses deterministic selection)
    rng = np.random.default_rng(0)
    if args.images:
        from kobato_eyes_tpu.utils.image_io import load_rgb_array

        paths = sorted(Path(args.images).rglob("*"))[:2048]
        arrays = [a for p in paths if (a := load_rgb_array(p)) is not None]
    else:
        n = args.synthetic or 256
        arrays = [
            rng.integers(0, 256, size=(args.image_size, args.image_size, 3), dtype=np.uint8)
            for _ in range(n)
        ]
    if len(arrays) < args.batch_size * (args.warmup_batches + 1):
        print(f"need at least {args.batch_size * (args.warmup_batches + 1)} images", file=sys.stderr)
        return 2

    # ---- prepared batches up front (isolate device-side throughput; the
    # loader path is benchmarked by the pipeline bench)
    batches = []
    prep_times = []
    for start in range(0, len(arrays) - args.batch_size + 1, args.batch_size):
        t0 = time.perf_counter()
        batches.append(tagger.prepare_batch_from_rgb(arrays[start : start + args.batch_size]))
        prep_times.append(time.perf_counter() - t0)

    # -- per-batch latency (blocking) on a few batches ----------------------
    infer_times: list[float] = []
    post_times: list[float] = []
    thr = tagger._thr_vec_np
    for i, batch in enumerate(batches[: args.warmup_batches + 3]):
        t0 = time.perf_counter()
        probs = tagger.forward_probs(batch)
        probs.block_until_ready()
        t1 = time.perf_counter()
        tagger._select(probs, thr, dict(tagger.max_tags), None)
        t2 = time.perf_counter()
        if i < args.warmup_batches:
            continue
        infer_times.append((t1 - t0) * 1000)
        post_times.append((t2 - t1) * 1000)

    # -- throughput (pipelined): dispatch every batch, then drain ----------
    # JAX dispatch is async — issuing all forwards lets transfers and compute
    # overlap instead of paying a full host<->device round trip per batch.
    from kobato_eyes_tpu.utils.profiling import device_trace

    timed = batches[args.warmup_batches :] or batches
    with device_trace(args.profile):
        t0 = time.perf_counter()
        all_results = tagger.infer_batches_prepared(timed)
        elapsed = time.perf_counter() - t0
    total_imgs = sum(len(r) for r in all_results)
    imgs_per_s = total_imgs / elapsed if elapsed > 0 else 0.0

    # -- roofline: analytic forward FLOPs (XLA cost_analysis counts the
    # nn.scan'd layer stack once, not x depth — see vit_forward_flops) vs the
    # measured device time and the chip's published peak (MFU) --------------
    from kobato_eyes_tpu.models.vit import ViTConfig, vit_forward_flops
    from kobato_eyes_tpu.utils.profiling import compiled_cost, roofline_summary

    cost = compiled_cost(lambda p, b: tagger._forward_probs(p, b), tagger.params, batches[0])
    roofline = None
    if infer_times:
        flops = (
            vit_forward_flops(tagger.cfg, batches[0].shape[0])
            if isinstance(tagger.cfg, ViTConfig)
            else cost.get("flops", 0.0)
        )
        if flops:
            roofline = roofline_summary(flops, np.median(infer_times) / 1000.0)
            roofline["compiled_flops_scan_body"] = cost.get("flops")
            roofline = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in roofline.items()
            }

    print(json.dumps({
        "metric": f"{args.tagger}_tagging_images_per_sec",
        "value": round(imgs_per_s, 3),
        "unit": "imgs/s",
        "batch_size": args.batch_size,
        "image_size": args.image_size,
        "labels": args.labels,
        "preset": args.preset,
        "batches_timed": len(infer_times),
        "infer_ms": _percentiles(infer_times),
        "post_ms": _percentiles(post_times),
        "prep_ms": _percentiles([t * 1000 for t in prep_times]),
        "roofline": roofline,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
