"""MFU probe: time ViT-B/448 forward variants on the attached chip.

VERDICT r2 weak #4: tagger forward measured at 82 ms/batch-32 = 31% MFU on
v5e; this probe times numerics-preserving variants (scan unroll, fused
attention, bf16 weights, batch scaling) to find where the gap lives, and can
capture a device trace (--profile DIR) whose per-op durations
tools/trace_ops.py summarizes.

Sync discipline per CLAUDE.md: block_until_ready is unreliable through the
relay; every timed repetition fetches a scalar result (one small D2H per
dispatch chain).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--repeats", type=int, default=20)
    parser.add_argument("--unroll", type=int, default=1)
    parser.add_argument("--attn", choices=["einsum", "fused"], default="einsum")
    parser.add_argument("--bf16-params", action="store_true")
    parser.add_argument("--labels", type=int, default=9083)
    parser.add_argument("--profile", metavar="DIR")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kobato_eyes_tpu.models.preprocess import PreprocessSpec, normalize_on_device
    from kobato_eyes_tpu.models.vit import ViT, init_params, vit_config, vit_forward_flops
    from kobato_eyes_tpu.utils.profiling import device_peak_flops, device_trace

    cfg = vit_config(
        "base", image_size=448, num_classes=args.labels,
        unroll=args.unroll, attn_impl=args.attn,
    )
    model = ViT(cfg)
    params = init_params(cfg, seed=0)
    if args.bf16_params:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    spec = PreprocessSpec(mode="wd14", size=448)

    @jax.jit
    def fwd(p, xb):
        h = normalize_on_device(xb, spec)
        return model.apply({"params": p}, h)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 256, (args.batch, 448, 448, 3), dtype=np.uint8)
    )
    x = jax.device_put(x)

    t0 = time.perf_counter()
    out = fwd(params, x)
    _ = float(out[0, 0])  # compile + sync
    compile_s = time.perf_counter() - t0

    # Timed: chain args.repeats dispatches, fetch one scalar at the end.
    # Queue depth hides the relay RTT; the chip executes back-to-back.
    def timed_chain(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, x)
        _ = float(out[0, 0])
        return (time.perf_counter() - t0) / n

    timed_chain(3)  # warm the dispatch path
    with device_trace(args.profile):
        per_batch = min(timed_chain(args.repeats) for _ in range(3))

    flops = vit_forward_flops(cfg, args.batch)
    peak = device_peak_flops() or 197e12
    tf = flops / per_batch / 1e12
    print(json.dumps({
        "variant": {
            "batch": args.batch, "unroll": args.unroll, "attn": args.attn,
            "bf16_params": bool(args.bf16_params), "labels": args.labels,
        },
        "ms_per_batch": round(per_batch * 1e3, 2),
        "imgs_per_s": round(args.batch / per_batch, 1),
        "tflops_per_s": round(tf, 1),
        "mfu_pct": round(100 * flops / per_batch / peak, 1),
        "compile_s": round(compile_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
