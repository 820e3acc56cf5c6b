"""Schema migration machinery (reference db/schema.py:122-177 versioned
upgrades).  The upgrade loop is proven with synthetic migrations stacked
ABOVE the real CURRENT_SCHEMA_VERSION so the test keeps working as real
migrations accrue (v2 added the meta table)."""

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

    base = schema.CURRENT_SCHEMA_VERSION
    monkeypatch.setattr(schema, "CURRENT_SCHEMA_VERSION", base + 2)
    monkeypatch.setattr(schema, "MIGRATIONS", {
        **schema.MIGRATIONS,
        base + 1: ("ALTER TABLE tags ADD COLUMN note TEXT",),
        base + 2: ("CREATE TABLE IF NOT EXISTS migration_probe (x INTEGER)",),
    })
    schema.ensure_schema(conn)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == base + 2
    # first synthetic migration applied without losing data
    assert conn.execute("SELECT note FROM tags WHERE name='keepme'").fetchone() == (None,)
    # second synthetic migration applied
    conn.execute("INSERT INTO migration_probe VALUES (1)")
    conn.close()


def test_partial_upgrade_resumes(tmp_path, monkeypatch):
    """A DB left at an intermediate version resumes from there, not from 0."""
    conn = sqlite3.connect(tmp_path / "c.sqlite")
    schema.ensure_schema(conn)
    base = schema.CURRENT_SCHEMA_VERSION
    monkeypatch.setattr(schema, "CURRENT_SCHEMA_VERSION", base + 2)
    monkeypatch.setattr(schema, "MIGRATIONS", {
        **schema.MIGRATIONS,
        base + 1: ("CREATE TABLE step2 (x INTEGER)",),
        base + 2: ("CREATE TABLE step3 (x INTEGER)",),
    })
    # simulate a crash after the first synthetic migration landed
    with conn:
        conn.execute("CREATE TABLE step2 (x INTEGER)")
        conn.execute(f"PRAGMA user_version = {base + 1}")
    schema.ensure_schema(conn)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == base + 2
    tables = {r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")}
    assert "step3" in tables
    conn.close()
