"""Env-helper + config-service edge coverage (reference utils/env.py safe_int
semantics and the config system's never-raise load policy)."""

from __future__ import annotations

from kobato_eyes_tpu.core.config.service import load_settings, save_settings
from kobato_eyes_tpu.utils.env import (
    env_flag,
    env_float,
    env_int,
    positive_or_none,
    safe_float,
    safe_int,
)


def test_safe_int_edges():
    assert safe_int(None) is None
    assert safe_int(None, 7) == 7
    assert safe_int("") is None
    assert safe_int("  42  ") == 42
    assert safe_int("-3") == -3
    assert safe_int("nope", 5) == 5
    assert safe_int("1.5", 5) == 5  # floats are not ints


def test_safe_float_edges():
    assert safe_float(None, 0.5) == 0.5
    assert safe_float("  1.25 ") == 1.25
    assert safe_float("x", 2.0) == 2.0
    assert safe_float("") is None


def test_env_accessors(monkeypatch):
    monkeypatch.setenv("KET_T_INT", "9")
    monkeypatch.setenv("KET_T_FLOAT", "0.75")
    monkeypatch.setenv("KET_T_FLAG", "YES")
    assert env_int("KET_T_INT", 1) == 9
    assert env_int("KET_T_MISSING", 1) == 1
    assert env_float("KET_T_FLOAT", 0.0) == 0.75
    assert env_flag("KET_T_FLAG") is True
    monkeypatch.setenv("KET_T_FLAG", "off")
    assert env_flag("KET_T_FLAG") is False
    assert env_flag("KET_T_MISSING", default=True) is True


def test_positive_or_none():
    assert positive_or_none("10") == 10
    assert positive_or_none("0") is None
    assert positive_or_none("-5") is None
    assert positive_or_none("junk") is None
    assert positive_or_none(None) is None


def test_load_settings_corrupt_yaml_falls_back(tmp_path):
    bad = tmp_path / "settings.yaml"
    bad.write_text("pipeline: [not, a, mapping\n  oops")
    settings = load_settings(bad)  # must not raise
    assert settings.pipeline.batch_size > 0  # defaults survived


def test_load_settings_missing_path_defaults(tmp_path):
    settings = load_settings(tmp_path / "does-not-exist.yaml")
    assert settings.tagger.name


def test_save_load_roundtrip(tmp_path):
    settings = load_settings(None)
    settings.pipeline = settings.pipeline.model_copy(update={"batch_size": 13})
    dest = tmp_path / "out.yaml"
    save_settings(settings, dest)
    back = load_settings(dest)
    assert back.pipeline.batch_size == 13
