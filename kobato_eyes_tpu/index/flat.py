"""Exact (brute-force) vector search as MXU matmuls.

The recall ground truth for every ANN structure, and a perfectly good
production index for <1M vectors on TPU: one (Q, D) x (D, N) matmul per
query batch at bf16 with f32 accumulation, fused top-k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def _search_kernel(queries: jnp.ndarray, corpus_t: jnp.ndarray, *, k: int):
    # f32 matmul: this is the *exact* index (recall ground truth), so no
    # bf16 rounding — the MXU still drives f32 via its passes.
    sims = jnp.dot(queries, corpus_t, preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, k)


def merged_topk(scores_g: jnp.ndarray, rows_g: jnp.ndarray, k: int):
    """Final top-k over shard-major gathered (scores, global rows).

    Tie-exact with the single-chip ``lax.top_k``: gathered order is
    shard-major and each shard's candidate list carries equal scores in
    ascending-row order, so ``top_k``'s earliest-position tie-break picks
    the lowest global row — the single-chip rule (index/flat.py docstring
    contract; asserted by tests/parallel/test_sharded_ann.py).
    """
    top_s, pos = jax.lax.top_k(scores_g, k)
    rows = jnp.take_along_axis(rows_g, pos, axis=1)
    return top_s, rows


@partial(jax.jit, static_argnames=("mesh", "n", "k"))
def _sharded_flat_search(mesh, corpus_sharded, n: int, q: jnp.ndarray, k: int):
    """Row-sharded exact search: per-shard matmul+top-k, gathered merge.

    ``mesh`` is static (hashable); one compile per (mesh, shapes, k).
    """
    from jax.sharding import PartitionSpec as P

    from kobato_eyes_tpu.parallel.mesh import DATA_AXIS

    d = int(mesh.shape[DATA_AXIS])
    rps = corpus_sharded.shape[0] // d
    k_local = min(k, rps)

    def body(corpus_local, queries):
        shard = jax.lax.axis_index(DATA_AXIS)
        sims = jnp.dot(
            queries, corpus_local.T, preferred_element_type=jnp.float32
        )  # (Q, rps)
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + shard * rps
        sims = jnp.where(col < n, sims, -jnp.inf)  # mask global pad rows
        s, idx = jax.lax.top_k(sims, k_local)
        rows = jnp.where(
            jnp.isfinite(s), idx.astype(jnp.int32) + shard * rps, -1
        )
        # all-gather candidates shard-major: (D, Q, k_local) -> every device
        return (
            jax.lax.all_gather(s, DATA_AXIS),
            jax.lax.all_gather(rows, DATA_AXIS),
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    s_g, r_g = mapped(corpus_sharded, q)  # (D, Q, k_local)
    nq = q.shape[0]
    s_flat = jnp.transpose(s_g, (1, 0, 2)).reshape(nq, d * k_local)
    r_flat = jnp.transpose(r_g, (1, 0, 2)).reshape(nq, d * k_local)
    top_s, rows = merged_topk(s_flat, r_flat, k)
    return top_s, rows


class FlatIndex:
    """Device-resident exact cosine/IP index.

    With ``mesh``, the corpus row-shards over the mesh's ``data`` axis
    (HBM and matmul FLOPs scale 1/D — the 10M+ vector story): each shard
    runs its (Q, N/D) matmul + local top-k, and the merged result is
    asserted tie-identical to single-chip (SURVEY §2.3 top-K ANN merge).
    """

    def __init__(
        self,
        vectors: np.ndarray,
        ids: np.ndarray | None = None,
        *,
        normalize: bool = True,
        mesh=None,  # jax.sharding.Mesh: row-shard the corpus over `data`
    ) -> None:
        vecs = np.asarray(vectors, dtype=np.float32)
        self.normalize = bool(normalize)  # persisted by index/auto.py sidecar
        if normalize:
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-30)
        self.ids = np.arange(len(vecs), dtype=np.int64) if ids is None else np.asarray(ids, np.int64)
        self._n = len(vecs)
        self._mesh = None
        if mesh is not None and int(mesh.shape.get("data", 1)) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            d = int(mesh.shape["data"])
            n_pad = -(-self._n // d) * d
            if n_pad != self._n:
                vecs = np.pad(vecs, ((0, n_pad - self._n), (0, 0)))
            self._mesh = mesh
            self._corpus = jax.device_put(
                vecs, NamedSharding(mesh, P("data", None))
            )  # (N_pad, D) row-sharded
            self._corpus_t = None
        else:
            self._corpus_t = jnp.asarray(vecs.T)  # (D, N) resident on device
        self.dim = vecs.shape[1]

    def __len__(self) -> int:
        return self._n

    def search(self, queries: np.ndarray, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores, ids) of shape (Q, k), score-descending."""
        q = np.asarray(queries, dtype=np.float32)
        norms = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.maximum(norms, 1e-30)
        k = min(k, len(self))
        if self._mesh is not None:
            scores, idx = _sharded_flat_search(
                self._mesh, self._corpus, self._n, jnp.asarray(q), k
            )
        else:
            scores, idx = _search_kernel(jnp.asarray(q), self._corpus_t, k=k)
        return np.asarray(scores), self.ids[np.asarray(idx)]


def find_similar(
    index: FlatIndex, query_vec: np.ndarray, *, exclude_id: int, k: int
) -> list[tuple[int, float]]:
    """Top-k (file_id, score) neighbors of one vector, the query excluded —
    the shared ranking behind GET /similar and `ket ann --similar-to`."""
    scores, nn = index.search(np.asarray(query_vec)[None, :], k=min(k + 1, len(index)))
    out: list[tuple[int, float]] = []
    for score, fid in zip(scores[0].tolist(), nn[0].tolist()):
        if int(fid) == int(exclude_id):
            continue
        out.append((int(fid), float(score)))
        if len(out) >= k:
            break
    return out
