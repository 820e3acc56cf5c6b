"""Window-resident Pallas attention for SwinV2 (cosine attention + CPB).

Same disease, bigger, as the ViT case (ops/pallas_attention.py): XLA's
einsum form materializes per-block (B*nW, H, w^2, w^2) f32 logits in HBM
and then runs the cosine-scale, CPB-bias-add, shift-mask and softmax as
separate bandwidth-bound passes over them — measured ~90 ms of the
SwinV2-B/448 forward's 185 ms (11-12% MFU).

Here one grid program per (batch, head) holds ALL of that head's windows in
VMEM: q/k/v tiles (nW, w^2, hd), the (nW, w^2, w^2) f32 logits (9.8 MB at
stage 0 — above Mosaic's default 16 MB scoped budget, raised via compiler
params), the per-head CPB bias, and the optional shift mask — cosine
normalization, scaling, bias, mask, softmax and the PV matmuls never touch
HBM.  The learned, exp-clamped logit scale rides in SMEM and is read per
program id.

Measured on SwinV2-B/448 batch-32: 187.6 -> 103.4 ms (11.3% -> 20.5% MFU
with tanh-gelu).  Null results from further layout iterations, recorded so
they aren't retried: (a) blocking the head axis directly on the natural
(B, nW, n, 3, H, hd) layout is illegal (Mosaic requires a block's last two
dims to equal the array's); (b) per-image programs with an in-kernel head
loop lower the loads fine but no store form works — strided stores into a
middle head axis and singleton-inserting reshapes before the lane dim are
both unsupported, and the head-leading-output variant hung the Mosaic
compile for 50+ minutes.  The one whole-tensor (3, H, B, nW, n, hd)
transpose XLA inserts for this layout is the cheapest legal option.
(c) QK precision is NOT a lever: Mosaic's DEFAULT already runs the f32
cosine-normalized operands at 1-pass bf16 MXU rate (explicit bf16 cast:
87.2 ms vs 86.6 on the packed layout, same probs_err 0.0021), and exact
6-pass f32 ("highest") costs 99.1 ms — the kernel's remaining ~24.5 ms is
K=hd=32 / N-tile padding plus VPU softmax, not matmul passes.

Numerics match models/swin.py's WindowAttention exactly (f32 normalize,
f32 logits/softmax, -100.0 soft masks) up to the QK precision knob
(default: bf16-rate matmul, probs-level deviation ~2e-3 on SwinV2-B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_attn_kernel(
    scale_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, qk_precision
):
    """One (batch, head): cosine attention over all nW windows in VMEM."""
    q = q_ref[0, 0, 0].astype(jnp.float32)  # (nW, n, hd)
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0]
    qn = q * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-12)
    )
    kn = k * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(k * k, axis=-1, keepdims=True), 1e-12)
    )
    prec = None
    if qk_precision == "bf16":
        # cosine-normalized operands are in [-1, 1]; bf16 inputs with f32
        # accumulation keep ~3 decimal digits on the logits while running
        # the QK matmul at full 1-pass MXU rate
        qn = qn.astype(jnp.bfloat16)
        kn = kn.astype(jnp.bfloat16)
    else:
        prec = jax.lax.Precision(qk_precision)
    # batched over the window axis: (nW, n, hd) x (nW, n, hd) -> (nW, n, n)
    logits = jax.lax.dot_general(
        qn, kn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )
    h_idx = pl.program_id(1)
    logits = logits * scale_ref[h_idx] + bias_ref[0]
    logits = logits + mask_ref[:]
    # Row-max softmax shift.  A static shift (exp(logits - 60), saving this
    # VPU pass, ~1.6 ms/forward) was measured and REJECTED: q and k are
    # different projections, so no row has a guaranteed-large logit — the
    # cosine-logit range with the clamped scale of 100 plus the -100 shift
    # mask is ~232 wide, beyond f32 exp's ~192, and a masked row whose keys
    # anti-correlate with its query underflows the whole row to 0/0 = NaN
    # (caught by test_static_shift_safe_at_production_bounds).
    m = jnp.max(logits, axis=2, keepdims=True)
    w = jnp.exp(logits - m).astype(v.dtype)
    s = jnp.sum(w, axis=2, keepdims=True, dtype=jnp.float32)
    o = jax.lax.dot_general(
        w, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "qk_precision"))
def _win_attn_call(qkv, scale, bias, mask, *, interpret: bool, qk_precision: str):
    """qkv (3, B, H, nW, n, hd); scale (H,) f32 pre-exp-clamped;
    bias (H, n, n) f32; mask (nW, n, n) f32 (zeros when unshifted)."""
    three, b, h, nw, n, hd = qkv.shape
    assert three == 3, qkv.shape

    # NB: with scalar prefetch, index maps receive the scalar refs as extra
    # trailing arguments — accept and ignore them
    def spec(which: int) -> pl.BlockSpec:
        return pl.BlockSpec(
            (1, 1, 1, nw, n, hd),
            lambda i, j, *_, _w=which: (_w, i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_win_attn_kernel, qk_precision=qk_precision),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h),
            in_specs=[
                spec(0), spec(1), spec(2),
                pl.BlockSpec(
                    (1, n, n), lambda i, j, *_: (j, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (nw, n, n), lambda i, j, *_: (0, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, nw, n, hd),
                lambda i, j, *_: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nw, n, hd), qkv.dtype),
        interpret=interpret,
    )(scale, qkv, qkv, qkv, bias, mask)


def windowed_cosine_attention_packed(
    qkv: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None,
    *,
    interpret: bool | None = None,
    qk_precision: str = "default",
) -> jax.Array:
    """SwinV2 window attention without HBM logits — head-major in and out.

    The production entry (models/swin.py): takes the qkv projection applied
    to the UNflattened (B, nW, n, C) window tensor and returns the kernel's
    native head-major output, so the caller can contract the output
    projection directly on (H, hd) via ``DenseGeneral(axis=(1, 4))`` —
    fewer whole-tensor relayout copies than flattening to (B*nW, ...) and
    transposing back (trace-measured: the copies around the kernel were
    ~39.5 ms of the 103 ms SwinV2-B/448 batch-32 forward).

    Args:
      qkv: (B, nW, n, 3, H, hd).
      scale: (H,) f32 — exp-clamped per-head logit scale.
      bias: (H, n, n) f32 — CPB relative-position bias (16*sigmoid form).
      mask: (nW, n, n) f32 additive shift mask, or None.
      qk_precision: QK matmul precision — "default" (bf16-rate, the
        measured-fastest), "high"/"highest" (more bf16 passes / exact f32),
        or "bf16" (cast operands, f32 accumulation).

    Returns (B, H, nW, n, hd).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n_windows, n, three, h, hd = qkv.shape
    x = qkv.transpose(3, 0, 4, 1, 2, 5)  # (3, B, H, nW, n, hd)
    if mask is None:
        mask = jnp.zeros((n_windows, n, n), jnp.float32)
    return _win_attn_call(
        x, scale.astype(jnp.float32), bias.astype(jnp.float32),
        mask.astype(jnp.float32), interpret=bool(interpret),
        qk_precision=qk_precision,
    )


def windowed_cosine_attention(
    qkv: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None,
    *,
    n_windows: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Flat-layout wrapper (kernel parity tests): (B*nW, n, 3, H, hd) in,
    (B*nW, n, H, hd) out."""
    bnw, n, three, h, hd = qkv.shape
    b = bnw // n_windows
    out = windowed_cosine_attention_packed(
        qkv.reshape(b, n_windows, n, 3, h, hd), scale, bias, mask,
        interpret=interpret,
    )  # (B, H, nW, n, hd)
    return out.transpose(0, 2, 3, 1, 4).reshape(bnw, n, h, hd)
