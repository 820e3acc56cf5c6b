"""Sharded-query skew policy + past-toy-size identity (VERDICT r4 weak #5).

The shard_map evaluator needs a rectangular (D, nnz_sh_pad) posting table,
so every shard pads to the busiest shard's entry count.  These tests pin:

- the balanced-distribution memory bound (padded total <= amp_cap x the
  single-chip padded size, floor-exempt),
- the adversarial-skew policy: rather than paying up to Dx memory, the
  engine refuses to shard (ValueError), search_epoch serves the query
  single-chip and memoizes the verdict — results stay identical,
- (slow) result identity at 300k files / ~2.4M postings on the 8-virtual-
  device CPU mesh, where shard-table sizing and slot bucketing are
  realistic rather than floor-dominated.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from kobato_eyes_tpu.parallel.mesh import make_mesh
from kobato_eyes_tpu.query.engine import _assemble_epoch, _pad_bucket, search_epoch
from kobato_eyes_tpu.query.sharded import _shard_epoch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)

TAGS = [
    ("1girl", 0), ("solo", 0), ("long_hair", 0), ("smile", 0), ("blue_eyes", 0),
    ("glasses", 0), ("some_char", 4), ("other_char", 4), ("franchise_a", 3),
    ("rating_safe", 2), ("artist_x", 1), ("highres", 5),
]


def _synth_epoch(
    n_files: int,
    postings_per_file: int,
    seed: int,
    *,
    tagged_rows: np.ndarray | None = None,
):
    """Epoch straight from arrays (no SQLite): ``tagged_rows`` restricts which
    file rows carry postings (the skew knob)."""
    rng = np.random.default_rng(seed)
    file_ids = np.arange(1, n_files + 1, dtype=np.int64)
    mtimes = rng.uniform(1e9, 2e9, size=n_files)
    sizes = rng.integers(1_000, 9_000_000, size=n_files)
    paths = [f"/skew/img_{i:07d}.png" for i in range(n_files)]
    rows = tagged_rows if tagged_rows is not None else np.arange(n_files)
    r_idx = np.repeat(rows.astype(np.int64), postings_per_file)
    # per-file distinct tags: offset pattern keyed by row so no (file, tag)
    # pair repeats
    t_idx = (
        (r_idx + np.tile(np.arange(postings_per_file), len(rows)) * 5)
        % len(TAGS)
    ).astype(np.int64)
    # dedupe (row, tag) pairs — CSR semantics assume one score per pair
    key = r_idx * len(TAGS) + t_idx
    _, uniq = np.unique(key, return_index=True)
    r_idx, t_idx = r_idx[uniq], t_idx[uniq]
    sc = rng.uniform(0.05, 1.0, size=len(r_idx)).astype(np.float32)
    return _assemble_epoch(
        version=0, file_ids=file_ids, mtimes=mtimes, sizes=sizes, paths=paths,
        tag_names=[t[0] for t in TAGS],
        tag_cats=np.array([t[1] for t in TAGS], dtype=np.int32),
        t_idx=t_idx, r_idx=r_idx.astype(np.int32), sc=sc,
    )


def test_balanced_amplification_bounded():
    """Uniform tag distribution: the padded sharded total stays within the
    documented cap of the single-chip padded size (floor-exempt)."""
    epoch = _synth_epoch(4000, 6, seed=3)
    mesh = make_mesh(data=8, model=1)
    sharded = _shard_epoch(epoch, mesh)
    d = sharded.n_shards
    padded_total = d * sharded.nnz_sh_pad
    single_chip = _pad_bucket(epoch.nnz)
    floor = max(single_chip, d * 256)
    assert padded_total <= 4.0 * floor, (
        f"balanced epoch amplified {padded_total / single_chip:.1f}x"
    )
    # identity sanity on the same epoch
    for q in ("1girl solo", "category:character score>=0.5"):
        a = search_epoch(epoch, q, limit=50)
        b = search_epoch(epoch, q, limit=50, mesh=mesh)
        assert [(r.file_id, r.relevance) for r in a] == [
            (r.file_id, r.relevance) for r in b
        ]


def test_adversarial_skew_falls_back_single_chip(caplog):
    """All postings landing in ONE row shard would amplify memory ~Dx; the
    engine must refuse to shard, warn once, and serve identical results."""
    import logging

    from kobato_eyes_tpu.query import engine as eng

    n_files = 2000  # n_pad 2048, rps 256 on 8 devices
    rng = np.random.default_rng(5)
    tagged = rng.permutation(200)  # rows 0..199 < rps: one busy shard
    epoch = _synth_epoch(n_files, 10, seed=5, tagged_rows=tagged)
    mesh = make_mesh(data=8, model=1)

    with pytest.raises(ValueError, match="skew"):
        _shard_epoch(epoch, mesh)

    eng._UNSHARDABLE_VERDICTS.pop(epoch, None)
    with caplog.at_level(logging.WARNING, logger="kobato_eyes_tpu.query.engine"):
        solo = search_epoch(epoch, "1girl OR smile", limit=50)
        via_mesh = search_epoch(epoch, "1girl OR smile", limit=50, mesh=mesh)
        again = search_epoch(epoch, "1girl OR smile", limit=50, mesh=mesh)
    warnings = [r for r in caplog.records if "cannot shard" in r.message]
    assert len(warnings) == 1, "skew verdict must be memoized per (epoch, mesh)"
    assert [(r.file_id, r.relevance) for r in via_mesh] == [
        (r.file_id, r.relevance) for r in solo
    ]
    assert [(r.file_id, r.relevance) for r in again] == [
        (r.file_id, r.relevance) for r in solo
    ]


def test_amp_cap_env_override(monkeypatch):
    """KET_QUERY_SHARD_AMP_CAP raises the ceiling: the same skewed epoch
    shards when the operator accepts the memory cost."""
    n_files = 2000
    rng = np.random.default_rng(5)
    tagged = rng.permutation(200)
    epoch = _synth_epoch(n_files, 10, seed=5, tagged_rows=tagged)
    mesh = make_mesh(data=8, model=1)
    monkeypatch.setenv("KET_QUERY_SHARD_AMP_CAP", "64")
    sharded = _shard_epoch(epoch, mesh)
    assert sharded.n_shards == 8
    a = search_epoch(epoch, "1girl solo", limit=50)
    b = search_epoch(epoch, "1girl solo", limit=50, mesh=mesh)
    assert [(r.file_id, r.relevance) for r in a] == [
        (r.file_id, r.relevance) for r in b
    ]


@pytest.mark.slow
def test_sharded_query_identity_300k():
    """300k files / ~2.3M postings: sharded result identity past toy size
    (shard tables are MB-scale; slot buckets exceed the 256 floor)."""
    epoch = _synth_epoch(300_000, 8, seed=9)
    assert epoch.nnz > 2_000_000
    mesh = make_mesh(data=8, model=1)
    queries = [
        "1girl solo",
        "1girl OR smile",
        "-( glasses ) score>=0.3",
        "category:character score>=0.5",
        "1girl AND ( some_char OR other_char )",
    ]
    for q in queries:
        for order_by in ("relevance", "mtime"):
            a = search_epoch(epoch, q, order_by=order_by, limit=100)
            b = search_epoch(epoch, q, order_by=order_by, limit=100, mesh=mesh)
            assert [(r.file_id, r.relevance) for r in a] == [
                (r.file_id, r.relevance) for r in b
            ], (q, order_by)
