"""IVF list padding: capped lists drop overflow with a warning, search still works."""

from __future__ import annotations

import logging

import numpy as np

from kobato_eyes_tpu.index.ivf import IvfFlatIndex


def test_max_list_pad_drops_with_warning(caplog, rng):
    # all vectors in one tight cluster -> one k-means list holds ~everything
    base = rng.normal(size=(1, 16)).astype(np.float32)
    vecs = base + 0.01 * rng.normal(size=(64, 16)).astype(np.float32)
    with caplog.at_level(logging.WARNING):
        idx = IvfFlatIndex(vecs, n_clusters=4, train_iters=4, max_list_pad=16)
    assert any("dropped" in rec.message for rec in caplog.records)
    scores, ids = idx.search(vecs[:4], k=3, nprobe=4)
    assert ids.shape == (4, 3)
    assert (ids >= -1).all()


def test_unpadded_keeps_everything(rng):
    vecs = rng.normal(size=(128, 16)).astype(np.float32)
    idx = IvfFlatIndex(vecs, n_clusters=8, train_iters=4)
    _, ids = idx.search(vecs[:8], k=1, nprobe=8)
    assert (ids[:, 0] == np.arange(8)).all()  # self-query with full probing
