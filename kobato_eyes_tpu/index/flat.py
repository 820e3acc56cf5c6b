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


class FlatIndex:
    """Device-resident exact cosine/IP index."""

    def __init__(self, vectors: np.ndarray, ids: np.ndarray | None = None, *, normalize: bool = True) -> None:
        vecs = np.asarray(vectors, dtype=np.float32)
        if normalize:
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-30)
        self.ids = np.arange(len(vecs), dtype=np.int64) if ids is None else np.asarray(ids, np.int64)
        self._corpus_t = jnp.asarray(vecs.T)  # (D, N) resident on device
        self.dim = vecs.shape[1]

    def __len__(self) -> int:
        return int(self._corpus_t.shape[1])

    def search(self, queries: np.ndarray, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores, ids) of shape (Q, k), score-descending."""
        q = np.asarray(queries, dtype=np.float32)
        norms = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.maximum(norms, 1e-30)
        k = min(k, len(self))
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
