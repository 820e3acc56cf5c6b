"""IVF list padding: capped lists split into replica lists; nothing is dropped."""

from __future__ import annotations

import logging

import numpy as np

from kobato_eyes_tpu.index.ivf import IvfFlatIndex


def test_max_list_pad_splits_keeps_all(rng):
    # all vectors in one tight cluster -> one k-means list holds ~everything;
    # the cap must split it into replicas, never drop members
    base = rng.normal(size=(1, 16)).astype(np.float32)
    vecs = base + 0.01 * rng.normal(size=(64, 16)).astype(np.float32)
    idx = IvfFlatIndex(vecs, n_clusters=4, train_iters=4, max_list_pad=16)
    members = np.asarray(idx._members)
    present = members[members >= 0]
    assert len(present) == 64 and len(np.unique(present)) == 64
    assert idx.n_lists >= 4
    scores, ids = idx.search(vecs[:4], k=3, nprobe=idx.n_lists)
    assert ids.shape == (4, 3)
    assert (ids[:, 0] == np.arange(4)).all()  # self-query hits with full probing


def test_unpadded_keeps_everything(rng):
    vecs = rng.normal(size=(128, 16)).astype(np.float32)
    idx = IvfFlatIndex(vecs, n_clusters=8, train_iters=4)
    _, ids = idx.search(vecs[:8], k=1, nprobe=8)
    assert (ids[:, 0] == np.arange(8)).all()  # self-query with full probing


def test_ivf_overflow_splitting_keeps_recall():
    """Adversarially skewed clusters with a small max_list_pad must not drop
    vectors: oversized lists split into replicas, and with enough probes
    recall matches the unpadded index."""
    import numpy as np

    # local generator: the session-scoped rng fixture's state depends on
    # suite order, and this test's recall bounds are calibrated to the data
    rng = np.random.default_rng(7)

    from kobato_eyes_tpu.index.flat import FlatIndex
    from kobato_eyes_tpu.index.ivf import IvfFlatIndex, recall_at_k

    # 600 points crammed into one tight ball + 200 spread out
    d = 32
    ball = rng.normal(0, 0.01, size=(600, d)) + rng.normal(0, 1, size=(1, d))
    rest = rng.normal(0, 1, size=(200, d))
    vecs = np.concatenate([ball, rest]).astype(np.float32)
    queries = vecs[rng.choice(len(vecs), size=20, replace=False)] + \
        rng.normal(0, 0.001, size=(20, d)).astype(np.float32)

    exact = FlatIndex(vecs)
    _, exact_ids = exact.search(queries, k=10)

    padded = IvfFlatIndex(vecs, n_clusters=8, max_list_pad=64, seed=1)
    assert padded.n_lists > padded.n_clusters  # splitting kicked in
    # every vector is a member of exactly one list
    members = np.asarray(padded._members)
    present = members[members >= 0]
    assert len(present) == len(vecs) and len(np.unique(present)) == len(vecs)

    _, ids_pad = padded.search(queries, k=10, nprobe=padded.n_lists)
    r_pad = recall_at_k(ids_pad, exact_ids, k=10)
    # probing everything == exact up to equal-similarity ties in top_k
    assert r_pad >= 0.99

    # partial probing degrades gracefully (tunable via nprobe), it does not
    # collapse the way silent member drops would
    _, ids_pad8 = padded.search(queries, k=10, nprobe=12)
    assert recall_at_k(ids_pad8, exact_ids, k=10) >= 0.5
