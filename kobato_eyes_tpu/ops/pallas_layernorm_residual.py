"""Residual-fused one-pass LayerNorm: ``out = shortcut + LN(x)``.

Second attempt at the r3 LayerNorm line item, with the ledger's stated
precondition honored (docs/benchmarks.md "r3 null result"): the r3 kernel
computed LN alone, so the post-norm residual add — which XLA fuses INTO its
LN apply pass — became an extra materialized HBM round-trip and the forward
got 15 ms SLOWER.  This kernel folds the residual into the epilogue, so the
comparison per (rows, C) tile is:

    XLA:    stats pass (read x) + apply pass (read x, read shortcut, write)
            = 3 reads + 1 write
    here:   read x once (tile-resident stats + apply), read shortcut, write
            = 2 reads + 1 write

i.e. exactly one HBM pass over the activation saved — the bound is ~1/4 of
the trace's 14.9 ms LayerNorm line (~3.7 ms/forward); it exists to settle
whether the fusion-barrier penalty or the saved pass wins once the
residual rides inside.

**MEASURED NULL (r4, order-independent A/B on v5e)**: SwinV2-B/448
batch-32 fast forward, ``tools/bench_swin.py --ln {xla,pallas_residual}``:
xla 97.39 / 97.33 ms vs this kernel 100.37 / 100.50 ms — the pallas_call
barrier costs ~3.1 ms MORE than the saved read pass, even with the
residual fused.  XLA's LN fusions absorb neighboring elementwise ops
beyond the residual (the 14.9 ms trace line was never pure LN), so the
"3 reads + 1 write" model above UNDERCOUNTS what the fusion already
shares.  The experiment the r3 ledger asked for is concluded; the kernel
stays as its push-button reproduction (``SwinConfig.ln_impl`` defaults to
"xla"; flip only to re-measure on new hardware generations where the
barrier/pass balance may shift).

Stats are f32 with flax's fast-variance formula (E[x²] − E[x]²), epsilon
inside the rsqrt, so CPU parity with ``shortcut + nn.LayerNorm(x)`` is
exact to normal f32 tolerance (tests/ops/test_layernorm_residual.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MAX_TILE_ROWS = 1024


def _pick_tile_rows(rows: int) -> int | None:
    """Largest multiple-of-8 divisor of ``rows`` ≤ _MAX_TILE_ROWS (None: no
    legal tiling — caller falls back to the XLA path)."""
    best = None
    for t in range(8, min(rows, _MAX_TILE_ROWS) + 1, 8):
        if rows % t == 0:
            best = t
    return best


def _ln_res_kernel(x_ref, res_ref, gamma_ref, beta_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    o_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_res_call(x2, res2, gamma, beta, *, eps: float, interpret: bool):
    rows, c = x2.shape
    tile = _pick_tile_rows(rows)
    assert tile is not None, "caller must check tileability"
    row_spec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_res_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2.dtype),
        grid=(rows // tile,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        interpret=interpret,
    )(x2, res2, gamma.reshape(1, c), beta.reshape(1, c))


def layernorm_residual(
    x: jax.Array,
    shortcut: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """``shortcut + LayerNorm(x)`` over the last axis, one read of ``x``.

    Any leading shape; falls back to the XLA formulation when the flattened
    row count has no multiple-of-8 divisor ≤ 1024 or the channel axis is not
    lane-aligned (both would force relayout copies that eat the saved pass).
    """
    c = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if c % _LANE or _pick_tile_rows(rows) is None:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
        return (shortcut.astype(jnp.float32) + y).astype(x.dtype)
    out = _ln_res_call(
        x.reshape(rows, c), shortcut.reshape(rows, c), gamma, beta,
        eps=float(eps), interpret=bool(interpret),
    )
    return out.reshape(x.shape)
