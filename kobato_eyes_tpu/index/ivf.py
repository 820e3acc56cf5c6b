"""IVF-Flat index: k-means coarse quantizer + per-list exact re-rank.

Pure-matmul ANN — the natural TPU structure (BASELINE.json north star lists
IVF-flat with TPU distance matmuls).  Build: Lloyd iterations entirely on
device (assignment matmul + segment-sum centroid update).  Search: one
(Q, K) centroid matmul -> top-nprobe lists -> ONE dense (Q, N) corpus
matmul masked to the probed lists -> top-k.  All static shapes, no gathers
on the hot path (see _ivf_search_kernel for why).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("n_clusters",))
def _lloyd_step(data: jnp.ndarray, centroids: jnp.ndarray, *, n_clusters: int):
    sims = jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)
    assign = jnp.argmax(sims, axis=1)
    sums = jax.ops.segment_sum(data, assign, num_segments=n_clusters)
    counts = jax.ops.segment_sum(jnp.ones(data.shape[0], jnp.float32), assign, num_segments=n_clusters)
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    # empty clusters keep their previous centroid
    new = jnp.where(counts[:, None] > 0, new, centroids)
    norms = jnp.linalg.norm(new, axis=1, keepdims=True)
    return new / jnp.maximum(norms, 1e-30), assign


def kmeans(
    data: np.ndarray,
    n_clusters: int,
    *,
    iters: int = 10,
    seed: int = 0,
    data_dev: "jnp.ndarray | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Spherical k-means on device. Returns (centroids, assignments).

    ``data_dev``: optional already-uploaded (and normalized) device copy of
    ``data`` — callers that keep the corpus resident (IvfFlatIndex) pass it
    so the build doesn't pay a second multi-GB host->device transfer."""
    vecs = np.asarray(data, dtype=np.float32)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(vecs), size=n_clusters, replace=False)
    if data_dev is None:
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norms, 1e-30)
        data_dev = jnp.asarray(vecs)
        init = vecs[pick]
    else:
        # caller already normalized + uploaded the corpus; re-normalizing the
        # whole host array would repeat two O(N*D) passes (~2 GB at 1M x 512)
        # just to pick n_clusters init rows — normalize only those rows
        init = vecs[pick]
        init = init / np.maximum(np.linalg.norm(init, axis=1, keepdims=True), 1e-30)
    cent = jnp.asarray(init)
    assign = None
    for _ in range(iters):
        cent, assign = _lloyd_step(data_dev, cent, n_clusters=n_clusters)
    return np.asarray(cent), np.asarray(assign)


@partial(jax.jit, static_argnames=("nprobe", "k"))
def _ivf_search_kernel(
    queries: jnp.ndarray,  # (Q, D) unit vectors
    centroids: jnp.ndarray,  # (L, D) one row per (possibly replica) list
    assign_list: jnp.ndarray,  # (N,) int32 list id of each corpus row
    corpus: jnp.ndarray,  # (N, D)
    *,
    nprobe: int,
    k: int,
):
    """Probe top-nprobe lists, then ONE (Q, N) corpus matmul masked to them.

    TPU-shaped IVF: the per-list gather formulation materializes a
    (Q, nprobe*pad, D) intermediate from HBM (multi-GB at 100k x 512 and
    query batches), while the MXU streams the whole corpus through a dense
    matmul in milliseconds — so eligibility (only probed lists compete, the
    defining IVF semantic) is applied as a mask on the full score matrix.
    """
    cs = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, nprobe)  # (Q, nprobe)
    nq = queries.shape[0]
    allowed = jnp.zeros((nq, centroids.shape[0]), dtype=bool)
    allowed = allowed.at[jnp.arange(nq)[:, None], probe].set(True)
    scores = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
    scores = jnp.where(allowed[:, assign_list], scores, -jnp.inf)  # (Q, N)
    top_s, rows = jax.lax.top_k(scores, k)
    rows = jnp.where(jnp.isfinite(top_s), rows, -1)
    return top_s, rows


@partial(jax.jit, static_argnames=("mesh", "n", "nprobe", "k"))
def _sharded_ivf_search(
    mesh, corpus_sharded, assign_sharded, centroids, n: int,
    q: jnp.ndarray, *, nprobe: int, k: int,
):
    """Row-sharded IVF search: per-shard masked matmul + top-k, gathered merge.

    The coarse probe (queries x centroids) is tiny and recomputed on every
    device from replicated operands — cheaper than a broadcast.  Eligibility
    and the corpus matmul are local to each row shard; only (D, Q, k_local)
    candidates cross the ICI (SURVEY §2.3 top-K ANN all-gather merge).
    """
    from jax.sharding import PartitionSpec as P

    from kobato_eyes_tpu.index.flat import merged_topk
    from kobato_eyes_tpu.parallel.mesh import DATA_AXIS

    d = int(mesh.shape[DATA_AXIS])
    rps = corpus_sharded.shape[0] // d
    k_local = min(k, rps)
    n_lists = centroids.shape[0]

    def body(corpus_local, assign_local, cents, queries):
        shard = jax.lax.axis_index(DATA_AXIS)
        cs = jnp.dot(queries, cents.T, preferred_element_type=jnp.float32)
        _, probe = jax.lax.top_k(cs, nprobe)
        nq = queries.shape[0]
        allowed = jnp.zeros((nq, n_lists), dtype=bool)
        allowed = allowed.at[jnp.arange(nq)[:, None], probe].set(True)
        sims = jnp.dot(
            queries, corpus_local.T, preferred_element_type=jnp.float32
        )  # (Q, rps)
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + shard * rps
        sims = jnp.where(allowed[:, assign_local] & (col < n), sims, -jnp.inf)
        s, idx = jax.lax.top_k(sims, k_local)
        rows = jnp.where(
            jnp.isfinite(s), idx.astype(jnp.int32) + shard * rps, -1
        )
        return (
            jax.lax.all_gather(s, DATA_AXIS),
            jax.lax.all_gather(rows, DATA_AXIS),
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    s_g, r_g = mapped(corpus_sharded, assign_sharded, centroids, q)
    nq = q.shape[0]
    s_flat = jnp.transpose(s_g, (1, 0, 2)).reshape(nq, d * k_local)
    r_flat = jnp.transpose(r_g, (1, 0, 2)).reshape(nq, d * k_local)
    top_s, rows = merged_topk(s_flat, r_flat, k)
    return top_s, jnp.where(jnp.isfinite(top_s), rows, -1)


class IvfFlatIndex:
    """Inverted-file flat index over unit vectors (cosine / inner product).

    With ``mesh``, the corpus (and its list assignment) row-shards over the
    mesh's ``data`` axis; k-means training runs the SAME jitted Lloyd step on
    the sharded corpus — XLA's GSPMD partitions the assignment matmul and
    inserts the psums for the segment-sum centroid update (the scaling-book
    recipe: annotate shardings, let the compiler place collectives).
    """

    def __init__(
        self,
        vectors: np.ndarray,
        ids: np.ndarray | None = None,
        *,
        n_clusters: int | None = None,
        train_iters: int = 10,
        seed: int = 0,
        max_list_pad: int | None = None,
        mesh=None,  # jax.sharding.Mesh: row-shard corpus + training over `data`
        quantizer: tuple[np.ndarray, np.ndarray] | None = None,  # (centroids, assign)
    ) -> None:
        vecs = np.asarray(vectors, dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norms, 1e-30)
        n = len(vecs)
        self.ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, np.int64)
        if n_clusters is None:
            n_clusters = max(1, int(np.sqrt(n)))
        n_clusters = min(n_clusters, n)
        self.n_clusters = n_clusters

        self._mesh = None
        if mesh is not None and int(mesh.shape.get("data", 1)) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            d = int(mesh.shape["data"])
            n_shard_pad = -(-n // d) * d
            vecs_pad = (
                np.pad(vecs, ((0, n_shard_pad - n), (0, 0)))
                if n_shard_pad != n else vecs
            )
            self._mesh = mesh
            corpus_dev = jax.device_put(
                vecs_pad, NamedSharding(mesh, P("data", None))
            )
            # Lloyd on the sharded corpus: padded zero rows all assign to one
            # cluster and would drag its centroid toward zero, so train on a
            # device view of the REAL rows only when padding was added (the
            # slice keeps the sharding; XLA re-balances the ragged tail).
            train_dev = corpus_dev[:n] if n_shard_pad != n else corpus_dev
        else:
            corpus_dev = jnp.asarray(vecs)  # single upload, reused by the search
            train_dev = corpus_dev
        if quantizer is not None:
            # precomputed (centroids, assignments): index restore, or exact
            # single-chip-identical mesh builds (sharded Lloyd reductions can
            # differ in the last bit, which is a different quantizer, not a
            # bug — tests use this seam to assert search identity strictly)
            centroids, assign = quantizer
            centroids = np.asarray(centroids, dtype=np.float32)
            assign = np.asarray(assign)
        else:
            centroids, assign = kmeans(
                vecs, n_clusters, iters=train_iters, seed=seed, data_dev=train_dev
            )
        counts = np.bincount(assign, minlength=n_clusters)
        pad = int(counts.max()) if max_list_pad is None else min(int(counts.max()), max_list_pad)
        pad = max(pad, 1)
        # Skewed k-means must not lose vectors: lists larger than the pad are
        # SPLIT into replica lists sharing the centroid (bounded memory, no
        # silent recall loss — an under-probed giant cluster degrades with
        # nprobe like any IVF, instead of unboundedly via dropped members).
        n_lists_per = np.maximum(1, np.ceil(counts / pad).astype(np.int64))
        n_lists = int(n_lists_per.sum())
        members = np.full((n_lists, pad), -1, dtype=np.int32)
        list_cluster = np.empty(n_lists, dtype=np.int64)
        order = np.argsort(assign, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])
        li = 0
        for c in range(n_clusters):
            rows = order[starts[c] : starts[c + 1]]
            if len(rows) == 0:
                list_cluster[li] = c
                li += 1
                continue
            for off in range(0, len(rows), pad):
                chunk = rows[off : off + pad]
                members[li, : len(chunk)] = chunk
                list_cluster[li] = c
                li += 1
        assert li == n_lists
        n_split = n_lists - n_clusters
        if n_split:
            logger.info(
                "ivf: %d oversized lists split into replicas (pad=%d, lists=%d)",
                n_split, pad, n_lists,
            )

        # row -> list id (replica-aware; every row is in exactly one list)
        assign_list = np.empty(n, dtype=np.int32)
        for li_, row_chunk in enumerate(members):
            valid_rows = row_chunk[row_chunk >= 0]
            assign_list[valid_rows] = li_

        self.n_lists = n_lists
        self._n = n
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_shard_pad = int(corpus_dev.shape[0])
            al = np.zeros(n_shard_pad, dtype=np.int32)  # pad rows masked by col<n
            al[:n] = assign_list
            self._centroids = jax.device_put(
                centroids[list_cluster].astype(np.float32),
                NamedSharding(mesh, P()),
            )
            self._assign_list = jax.device_put(al, NamedSharding(mesh, P("data")))
        else:
            self._centroids = jnp.asarray(centroids[list_cluster])
            self._assign_list = jnp.asarray(assign_list)
        # host-only: the search kernel reads assign_list, not the member
        # table (kept for introspection/tests — no reason to burn HBM on it)
        self._members = members
        self._corpus = corpus_dev
        self.dim = vecs.shape[1]

    def __len__(self) -> int:
        return self._n

    def search(
        self, queries: np.ndarray, k: int = 10, *, nprobe: int = 8
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.float32)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        nprobe = min(nprobe, self.n_lists)
        k = min(k, len(self))
        if self._mesh is not None:
            scores, rows = _sharded_ivf_search(
                self._mesh, self._corpus, self._assign_list, self._centroids,
                self._n, jnp.asarray(q), nprobe=nprobe, k=k,
            )
        else:
            scores, rows = _ivf_search_kernel(
                jnp.asarray(q), self._centroids, self._assign_list, self._corpus,
                nprobe=nprobe, k=k,
            )
        rows = np.asarray(rows)
        scores = np.asarray(scores)
        ids = np.where(rows >= 0, self.ids[np.maximum(rows, 0)], -1)
        return scores, ids


def recall_at_k(
    approx_ids: np.ndarray, exact_ids: np.ndarray, k: int = 10
) -> float:
    """Mean overlap@k between an ANN result and the exact result."""
    hits = 0
    total = 0
    for a, e in zip(approx_ids, exact_ids):
        truth = set(int(x) for x in e[:k])
        hits += len(truth & set(int(x) for x in a[:k]))
        total += len(truth)
    return hits / max(total, 1)
