"""Schema migration machinery (reference db/schema.py:122-177 versioned
upgrades).  There are no real migrations yet (CURRENT_SCHEMA_VERSION=1), so
the upgrade loop is proven with a synthetic v2 migration before it is ever
needed in anger."""

from __future__ import annotations

import sqlite3

from kobato_eyes_tpu.db import schema


def test_fresh_bootstrap_sets_current_version(tmp_path):
    conn = sqlite3.connect(tmp_path / "a.sqlite")
    schema.ensure_schema(conn)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == schema.CURRENT_SCHEMA_VERSION
    # idempotent
    schema.ensure_schema(conn)
    tables = {r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"files", "tags", "file_tags", "signatures", "tagger_thresholds", "embeddings"} <= tables
    conn.close()


def test_upgrade_loop_applies_pending_migrations(tmp_path, monkeypatch):
    conn = sqlite3.connect(tmp_path / "b.sqlite")
    schema.ensure_schema(conn)  # v1 with data in place
    conn.execute("INSERT INTO tags (name, category) VALUES ('keepme', 0)")
    conn.commit()

    monkeypatch.setattr(schema, "CURRENT_SCHEMA_VERSION", 3)
    monkeypatch.setattr(schema, "MIGRATIONS", {
        2: ("ALTER TABLE tags ADD COLUMN note TEXT",),
        3: ("CREATE TABLE IF NOT EXISTS migration_probe (x INTEGER)",),
    })
    schema.ensure_schema(conn)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == 3
    # v2 change applied without losing data
    assert conn.execute("SELECT note FROM tags WHERE name='keepme'").fetchone() == (None,)
    # v3 change applied
    conn.execute("INSERT INTO migration_probe VALUES (1)")
    conn.close()


def test_partial_upgrade_resumes(tmp_path, monkeypatch):
    """A DB left at an intermediate version resumes from there, not from 0."""
    conn = sqlite3.connect(tmp_path / "c.sqlite")
    schema.ensure_schema(conn)
    monkeypatch.setattr(schema, "CURRENT_SCHEMA_VERSION", 3)
    monkeypatch.setattr(schema, "MIGRATIONS", {
        2: ("CREATE TABLE step2 (x INTEGER)",),
        3: ("CREATE TABLE step3 (x INTEGER)",),
    })
    # simulate a crash after v2 landed
    with conn:
        conn.execute("CREATE TABLE step2 (x INTEGER)")
        conn.execute("PRAGMA user_version = 2")
    schema.ensure_schema(conn)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == 3
    tables = {r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")}
    assert "step3" in tables
    conn.close()
