"""SwinV2 MFU probe: time SwinV2-B/448 forward variants on the attached chip.

VERDICT r3 #3: SwinV2 fast-path MFU was 24.5% vs the ViT's 56.2%, with a
written per-op budget (docs/benchmarks.md).  This harness makes the r3
ad-hoc measurements reproducible and A/Bs the remaining knobs:

  --attn einsum|pallas      window attention implementation
  --ln xla|pallas_residual  post-norm LayerNorm (r4: residual fused into the
                            kernel epilogue — the r3 null result's retry
                            condition)
  --qk default|bf16|highest QK matmul precision inside the pallas kernel

Sync discipline per CLAUDE.md: block_until_ready is unreliable through the
relay; every timed repetition fetches a scalar result.
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
    parser.add_argument("--attn", choices=["einsum", "pallas"], default="pallas")
    parser.add_argument("--ln", choices=["xla", "pallas_residual"], default="xla")
    parser.add_argument("--qk", choices=["default", "bf16", "highest"], default="default")
    parser.add_argument("--act", choices=["gelu", "gelu_tanh"], default="gelu_tanh")
    parser.add_argument("--preset", default="base")
    parser.add_argument("--image-size", type=int, default=448)
    parser.add_argument("--labels", type=int, default=9083)
    parser.add_argument("--profile", metavar="DIR")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kobato_eyes_tpu.models.preprocess import PreprocessSpec, normalize_on_device
    from kobato_eyes_tpu.models.swin import (
        SwinV2,
        init_swin_params,
        swin_config,
        swin_forward_flops,
    )
    from kobato_eyes_tpu.utils.profiling import device_peak_flops, device_trace

    cfg = swin_config(
        args.preset, image_size=args.image_size, num_classes=args.labels,
        attn_impl=args.attn, act=args.act, qk_precision=args.qk,
        ln_impl=args.ln,
    )
    model = SwinV2(cfg)
    params = init_swin_params(cfg, seed=0)
    spec = PreprocessSpec(mode="wd14", size=args.image_size)

    @jax.jit
    def fwd(p, xb):
        h = normalize_on_device(xb, spec)
        return model.apply({"params": p}, h)

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (args.batch, args.image_size, args.image_size, 3), dtype=np.uint8)
    ))

    t0 = time.perf_counter()
    out = fwd(params, x)
    _ = float(out[0, 0])  # compile + sync
    compile_s = time.perf_counter() - t0

    def timed_chain(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, x)
        _ = float(out[0, 0])
        return (time.perf_counter() - t0) / n

    timed_chain(3)  # warm the dispatch path
    with device_trace(args.profile):
        per_batch = min(timed_chain(args.repeats) for _ in range(3))

    flops = swin_forward_flops(cfg, args.batch)
    peak = device_peak_flops() or 197e12
    print(json.dumps({
        "variant": {
            "batch": args.batch, "attn": args.attn, "ln": args.ln,
            "qk": args.qk, "act": args.act, "labels": args.labels,
        },
        "ms_per_batch": round(per_batch * 1e3, 2),
        "imgs_per_s": round(args.batch / per_batch, 1),
        "tflops_per_s": round(flops / per_batch / 1e12, 1),
        "mfu_pct": round(100 * flops / per_batch / peak, 1),
        "compile_s": round(compile_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
