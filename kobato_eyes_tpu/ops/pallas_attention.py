"""Head-resident Pallas attention for moderate sequence lengths (ViT-class).

Profiled bottleneck of the ViT-B/448 forward (785 tokens): XLA's einsum
attention materializes the (B, H, T, T) f32 logits in HBM — ~24 GB of
write+read traffic per batch-32 forward, saturating v5e bandwidth for
~40 ms of the 84 ms step (tools/trace_ops.py on a captured trace:
QK+logits fusion at 563 GB/s, softmax+PV at 683 GB/s).

At T <= ~1.5k the ENTIRE per-(batch, head) problem fits VMEM: q/k/v tiles
are ~100 KB each and the (T, T) f32 logits ~2.5 MB.  So instead of
flash-attention streaming (whose generic kernel pays per-block grid
overhead far exceeding this shape's ~0.3 ms of MXU work — measured 179 ms
on this shape), one grid program per (batch, head) computes the whole head:
logits, f32 row softmax, and the PV matmul, with the logits never leaving
VMEM.

Layout notes (trace-driven, two iterations):
* Mosaic requires each block's last two dims to equal the array's (or be
  (8, 128)-aligned), so per-head blocking needs the head axis OUTSIDE the
  last two dims.  The packed path transposes the qkv projection's
  (B, T, 3, H, D) output once to (3, H, B, T, D) and then blocks full
  (T, D) planes via three index maps into the same array — replacing the
  first cut's three slice copies + per-tensor fold/pad (which cost ~12 ms
  per forward in XLA data formatting).
* T needs no padding or key masking: the block spans the full logical T
  and Mosaic masks the physical tile padding internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_body(q, k, v, o_ref, out_index, *, scale: float):
    """softmax(scale * q k^T) v with the (T, T) logits resident in VMEM.

    q is scaled in-kernel: one pass over a (T, D) tile, and the 1/sqrt(d)
    scale is a power of two for every supported head_dim (exact in bf16).
    """
    q = q * jnp.asarray(scale, q.dtype)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T) f32
    m = jnp.max(logits, axis=1, keepdims=True)
    # unnormalized weights straight to the matmul dtype; normalize AFTER the
    # PV product on the (T, D) output — saves a full (T, T) division pass
    # (the kernel is VPU-bound: every T^2 elementwise pass is ~10% of it)
    w = jnp.exp(logits - m).astype(v.dtype)
    s = jnp.sum(w, axis=1, keepdims=True, dtype=jnp.float32)
    o = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[out_index] = (o / s).astype(o_ref.dtype)


def _attn_kernel4(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    _attn_body(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], o_ref, (0, 0), scale=scale
    )


def _attn_kernel5(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    _attn_body(
        q_ref[0, 0, 0], k_ref[0, 0, 0], v_ref[0, 0, 0], o_ref, (0, 0), scale=scale
    )


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _attn_call(q, k, v, *, scale: float, interpret: bool):
    """q/k/v in (H, B, T, D); output (H, B, T, D)."""
    h, b, t, d = q.shape
    spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel4, scale=scale),
        out_shape=jax.ShapeDtypeStruct((h, b, t, d), q.dtype),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _attn_call_packed(qkv, *, scale: float, interpret: bool):
    """qkv in (3, H, B, T, D); output (H, B, T, D)."""
    three, h, b, t, d = qkv.shape
    assert three == 3, qkv.shape

    def spec(which: int) -> pl.BlockSpec:
        return pl.BlockSpec(
            (1, 1, 1, t, d),
            lambda i, j, _w=which: (_w, j, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, 1, t, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel5, scale=scale),
        out_shape=jax.ShapeDtypeStruct((h, b, t, d), qkv.dtype),
        grid=(b, h),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=out_spec,
        interpret=interpret,
    )(qkv, qkv, qkv)


def head_resident_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, T, H, D) attention; exact softmax, no (T, T) HBM intermediate.

    Requires the (T, T) f32 logits (plus q/k/v tiles) to fit VMEM — fine
    through T ~= 2000 on v5e's 128 MB.  Falls back to interpret mode
    off-TPU so tests run everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fold = lambda x: x.transpose(2, 0, 1, 3)  # (H, B, T, D)
    out = _attn_call(
        fold(q), fold(k), fold(v), scale=float(scale), interpret=bool(interpret)
    )
    return out.transpose(1, 2, 0, 3)


def head_resident_attention_packed(
    qkv: jax.Array, *, scale: float, interpret: bool | None = None
) -> jax.Array:
    """Packed (B, T, 3, H, D) qkv projection output -> (B, T, H, D).

    One whole-tensor transpose to (3, H, B, T, D), then the kernel reads
    q/k/v via three block index maps into the same array — no per-tensor
    slice copies.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = qkv.transpose(2, 3, 0, 1, 4)  # (3, H, B, T, D)
    out = _attn_call_packed(x, scale=float(scale), interpret=bool(interpret))
    return out.transpose(1, 2, 0, 3)
