"""Multi-chip duplicate candidate scan: row-sharded windowed compare.

The SURVEY §7 step-7 design ("shard by file-id; all-gather candidate
edges"): per-band sorted hash arrays are replicated (they're small — 70k
hashes = 0.5 MB), each device evaluates the windowed compare for its own
contiguous row block (plus a window-sized halo it reads from the replicated
arrays), and the fixed-size edge sets all-gather back. Work scales 1/D per
chip with zero redistribution cost because the compare is embarrassingly
parallel over rows.

Built on ``jax.shard_map`` over the ``data`` axis of a mesh; runs on the
8-virtual-device CPU mesh in tests and on real slices unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kobato_eyes_tpu.parallel.mesh import DATA_AXIS


def _shard_body(
    sk: jnp.ndarray,  # (B, N) sorted band keys, replicated
    sph: jnp.ndarray,  # (B, N, 2) hashes in sorted order, replicated
    sok: jnp.ndarray,  # (B, N) bucket mask, replicated
    hamming_threshold: jnp.ndarray,
    *,
    window: int,
    rows_per_shard: int,
    max_edges_per_shard: int,
    n_devices: int,
):
    """Body run per device: evaluate rows [shard*rows, shard*rows+rows)."""
    shard = jax.lax.axis_index(DATA_AXIS)
    nb, n = sk.shape
    start = shard * rows_per_shard

    col_local = jax.lax.broadcasted_iota(jnp.int32, (nb, window, rows_per_shard), 2)
    col = col_local + start
    dd = jax.lax.broadcasted_iota(jnp.int32, (nb, window, rows_per_shard), 1) + 1
    jj = col + dd
    valid = (jj < n) & (col < n)
    jjc = jnp.minimum(jj, n - 1)
    colc = jnp.minimum(col, n - 1)

    take = lambda arr, idx: jnp.take_along_axis(arr[:, None, :], idx, axis=2)  # noqa: E731
    eq = (take(sk, colc) == take(sk, jjc)) & valid
    eq &= take(sok, colc) & take(sok, jjc)
    dist = (
        jax.lax.population_count(take(sph[..., 0], colc) ^ take(sph[..., 0], jjc))
        + jax.lax.population_count(take(sph[..., 1], colc) ^ take(sph[..., 1], jjc))
    ).astype(jnp.int32)
    mask = eq & (dist <= hamming_threshold)

    n_edges = jnp.sum(mask, dtype=jnp.int32)
    b_idx, w_idx, i_local = jnp.nonzero(mask, size=max_edges_per_shard, fill_value=-1)
    i_sorted = jnp.where(b_idx >= 0, i_local + start, -1)
    j_sorted = jnp.where(b_idx >= 0, i_sorted + w_idx + 1, -1)
    d_out = jnp.where(
        b_idx >= 0, dist[jnp.maximum(b_idx, 0), jnp.maximum(w_idx, 0), jnp.maximum(i_local, 0)], -1
    )
    # per-shard edge count rides in the reserved last slot of row 0 so the
    # caller can detect truncation (edges beyond the cap would silently
    # vanish otherwise)
    row_b = jnp.maximum(b_idx, -1).at[max_edges_per_shard - 1].set(n_edges)
    out = jnp.stack([row_b, i_sorted, j_sorted, d_out])  # (4, cap)
    # all-gather the per-shard edge blocks -> (D, 4, cap) on every device
    return jax.lax.all_gather(out, DATA_AXIS)


def sharded_window_scan(
    mesh,
    sk: np.ndarray,  # (B, N) sorted band keys
    sph: np.ndarray,  # (B, N, 2) uint32 sorted hashes
    sok: np.ndarray,  # (B, N) bool
    *,
    hamming_threshold: int,
    window: int,
    max_edges_per_shard: int = 1 << 15,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run the windowed compare across the mesh's data axis.

    Returns (band, i_sorted, j_sorted, dist) edge arrays in per-band sorted
    coordinates (mapping back through each band's sort order and pair
    deduplication are the caller's job, identical to the single-chip path).
    """
    n_devices = mesh.shape[DATA_AXIS]
    nb, n = sk.shape
    rows_per_shard = -(-n // n_devices)  # cdiv

    body = partial(
        _shard_body,
        window=window,
        rows_per_shard=rows_per_shard,
        max_edges_per_shard=max_edges_per_shard,
        n_devices=n_devices,
    )
    replicated = NamedSharding(mesh, P())
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    fn = jax.jit(mapped)
    gathered = np.asarray(
        fn(
            jax.device_put(jnp.asarray(sk), replicated),
            jax.device_put(jnp.asarray(sph), replicated),
            jax.device_put(jnp.asarray(sok), replicated),
            jnp.int32(hamming_threshold),
        )
    )  # (D, 4, cap)
    counts = gathered[:, 0, -1]
    worst = int(counts.max()) if len(counts) else 0
    if worst > max_edges_per_shard - 1:
        raise ValueError(
            f"sharded scan overflow: a shard produced {worst} edges "
            f"(cap {max_edges_per_shard - 1}); retry with a larger "
            f"max_edges_per_shard"
        )
    # the count slot is excluded by the keep mask below: its i/j entries are
    # -1 padding whenever count <= cap-1 (enforced above)
    b = gathered[:, 0, :].ravel()
    i = gathered[:, 1, :].ravel()
    j = gathered[:, 2, :].ravel()
    d = gathered[:, 3, :].ravel()
    keep = (b >= 0) & (i >= 0) & (j >= 0)
    return (
        b[keep].astype(np.int64),
        i[keep].astype(np.int64),
        j[keep].astype(np.int64),
        d[keep].astype(np.int64),
    )
