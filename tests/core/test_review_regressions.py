"""Regression tests for the review findings (path prefixes, stale caches,
stale vectors, mixed dims)."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.core.config.schema import IndexSettings, PipelineSettings, Settings
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.core.pipeline.contracts import FileRecord
from kobato_eyes_tpu.core.pipeline.embed_stage import load_embeddings, store_embeddings
from kobato_eyes_tpu.core.pipeline.loaders import PreparedInputCache
from kobato_eyes_tpu.core.pipeline.maintenance import refresh_root
from kobato_eyes_tpu.db.connection import bootstrap, reset_bootstrap_cache
from kobato_eyes_tpu.db.repository import path_prefix_clause, upsert_file
from kobato_eyes_tpu.models.tagger import DummyTagger

pytestmark = pytest.mark.integration


def test_path_prefix_clause_is_separator_anchored(tmp_path):
    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "p.sqlite")
    try:
        upsert_file(conn, path="/data/cat/a.png")
        upsert_file(conn, path="/data/cats/b.png")  # sibling sharing the prefix
        upsert_file(conn, path="/data/c_t/c.png")  # underscore wildcard trap
        clause, pattern = path_prefix_clause("/data/cat")
        rows = conn.execute(f"SELECT path FROM files WHERE {clause}", (pattern,)).fetchall()
        assert [r["path"] for r in rows] == ["/data/cat/a.png"]
    finally:
        conn.close()


def test_refresh_hard_delete_spares_sibling_roots(tmp_path, rng):
    reset_bootstrap_cache()
    cat = tmp_path / "cat"
    cats = tmp_path / "cats"
    for d in (cat, cats):
        d.mkdir()
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(d / "img.png")
    db = tmp_path / "c.sqlite"
    settings = Settings(pipeline=PipelineSettings(roots=[cat, cats], batch_size=2))
    run_index_once(db, settings, DummyTagger())
    # refresh only /cat with hard delete: /cats rows must survive
    refresh_root(db, settings, DummyTagger(), cat, hard_delete=True)
    conn = bootstrap(db)
    try:
        paths = [r["path"] for r in conn.execute("SELECT path FROM files")]
    finally:
        conn.close()
    assert any("cats" in p for p in paths), "sibling root was deleted!"


def test_cache_namespace_prevents_cross_tagger_hits(tmp_path, image_dir):
    root, paths = image_dir
    records = lambda: [  # noqa: E731
        FileRecord(i, p, p.stat().st_size, p.stat().st_mtime) for i, p in enumerate(paths)
    ]
    a = PreparedInputCache(tmp_path / "c", namespace="wd14:448")
    b = PreparedInputCache(tmp_path / "c", namespace="pixai:256")
    rec = records()[0]
    a.put(rec, np.zeros((448, 448, 3), np.uint8), 10, 10)
    assert a.get(rec) is not None
    assert b.get(rec) is None  # different namespace -> miss


def test_content_change_reembeds(tmp_path, image_dir, rng):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "e.sqlite"
    settings = Settings(
        pipeline=PipelineSettings(roots=[root], batch_size=2),
        index=IndexSettings(enabled=True, embed_dim=64, preset="tiny",
                            image_size=64, patch_size=16),
    )
    run_index_once(db, settings, DummyTagger())
    conn = bootstrap(db)
    try:
        ids, before = load_embeddings(conn)
    finally:
        conn.close()
    # rewrite one file with different pixels
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8), "RGB").save(paths[0])
    stats = run_index_once(db, settings, DummyTagger())
    assert stats.extra["embedded"] == 1  # exactly the changed file
    conn = bootstrap(db)
    try:
        ids2, after = load_embeddings(conn)
    finally:
        conn.close()
    changed_row = int(np.nonzero(ids == ids[0])[0][0])
    assert not np.allclose(before[changed_row], after[changed_row])


def test_load_embeddings_mixed_dims(tmp_path):
    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "m.sqlite")
    try:
        a = upsert_file(conn, path="/m/a.png")
        b = upsert_file(conn, path="/m/b.png")
        c = upsert_file(conn, path="/m/c.png")
        with conn:
            store_embeddings(conn, [(a, np.ones(8, np.float32)),
                                    (b, np.ones(8, np.float32))])
            store_embeddings(conn, [(c, np.ones(16, np.float32))])
        ids, vecs = load_embeddings(conn)
        assert vecs.shape == (2, 8)  # majority dim kept, odd row skipped
        assert set(ids.tolist()) == {a, b}
    finally:
        conn.close()


def test_embed_dim_change_reembeds(tmp_path, image_dir):
    """Changing index.embed_dim re-embeds the library (no stranded dims)."""
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "dim.sqlite"

    def settings_for(dim):
        return Settings(
            pipeline=PipelineSettings(roots=[root], batch_size=2),
            index=IndexSettings(enabled=True, embed_dim=dim, preset="tiny",
                                image_size=64, patch_size=16),
        )

    run_index_once(db, settings_for(64), DummyTagger())
    stats = run_index_once(db, settings_for(32), DummyTagger())
    assert stats.extra["embedded"] == len(paths)  # full re-embed at the new dim
    conn = bootstrap(db)
    try:
        ids, vecs = load_embeddings(conn)
    finally:
        conn.close()
    assert vecs.shape == (len(paths), 32)  # no mixed dims remain


def test_delta_category_change_falls_back(tmp_path):
    """A tag-category edit must invalidate the delta fast path's panels."""
    from kobato_eyes_tpu.db.repository import TaggingItem, upsert_file, write_tagging_batch
    from kobato_eyes_tpu.query.engine import build_epoch, search_epoch, update_epoch

    reset_bootstrap_cache()
    conn = bootstrap(tmp_path / "cat.sqlite")
    try:
        items = []
        for i in range(12):
            fid = upsert_file(conn, path=f"/c/{i}.png", mtime=1e9 + i)
            items.append(TaggingItem(fid, [("alpha", 0.9, 0)]))
        write_tagging_batch(conn, items)
        prev = build_epoch(conn, version=1)
        with conn:
            conn.execute("UPDATE tags SET category=4 WHERE name='alpha'")
        fid = upsert_file(conn, path="/c/new.png", mtime=2e9)
        write_tagging_batch(conn, [TaggingItem(fid, [("alpha", 0.8, 4)])])
        delta = update_epoch(conn, prev, changed_file_ids=[fid], version=2)
        full = build_epoch(conn, version=2)
        a = [r.file_id for r in search_epoch(delta, "category:character", order_by="id")]
        b = [r.file_id for r in search_epoch(full, "category:character", order_by="id")]
        assert a == b and len(a) == 13
    finally:
        conn.close()
