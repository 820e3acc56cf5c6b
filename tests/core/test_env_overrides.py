"""KET_* environment flag overrides over loaded settings."""

from __future__ import annotations

from kobato_eyes_tpu.core.config.schema import Settings
from kobato_eyes_tpu.core.config.service import apply_env_overrides


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("KET_BATCH_SIZE", "64")
    monkeypatch.setenv("KET_PREFETCH_DEPTH", "2")
    monkeypatch.setenv("KET_TAGGER_INPUT_CACHE", "true")
    monkeypatch.setenv("KET_HAMMING_THRESHOLD", "4")
    monkeypatch.setenv("KET_DUP_BUCKET_PAIR_CAP", "0")  # <=0 -> None
    monkeypatch.setenv("KET_TAG_SCORE_FLOOR", "0.2")
    s = apply_env_overrides(Settings())
    assert s.pipeline.batch_size == 64
    assert s.pipeline.prefetch_depth == 2
    assert s.pipeline.tagger_input_cache is True
    assert s.dup.hamming_threshold == 4
    assert s.dup.bucket_pair_cap is None
    assert s.tagger.score_floor == 0.2


def test_env_bad_values_ignored(monkeypatch):
    monkeypatch.setenv("KET_BATCH_SIZE", "not-a-number")
    s = apply_env_overrides(Settings())
    assert s.pipeline.batch_size == 32  # default kept


def test_corrupt_yaml_falls_back_to_defaults(tmp_path):
    from kobato_eyes_tpu.core.config.schema import Settings
    from kobato_eyes_tpu.core.config.service import load_settings

    bad = tmp_path / "settings.yaml"
    bad.write_text("pipeline: [not: a: mapping\n  ::::")
    s = load_settings(bad)  # warns, never raises
    assert s == Settings()
    assert load_settings(tmp_path / "nope.yaml") == Settings()
    assert load_settings(None) == Settings()


def test_save_settings_roundtrip_atomic(tmp_path):
    from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
    from kobato_eyes_tpu.core.config.service import load_settings, save_settings

    s = Settings(pipeline=PipelineSettings(roots=[tmp_path], batch_size=7))
    out = tmp_path / "cfg" / "settings.yaml"
    save_settings(s, out)
    again = load_settings(out)
    assert again.pipeline.batch_size == 7
    assert [str(r) for r in again.pipeline.roots] == [str(tmp_path)]
    assert not list(out.parent.glob("*.tmp"))  # temp file cleaned up


def test_env_cache_flag_and_dup_overrides(monkeypatch):
    from kobato_eyes_tpu.core.config.schema import Settings
    from kobato_eyes_tpu.core.config.service import apply_env_overrides

    monkeypatch.setenv("KET_TAGGER_INPUT_CACHE", "ON")
    monkeypatch.setenv("KET_DUP_BUCKET_PAIR_CAP", "0")  # 0 -> uncapped (None)
    monkeypatch.setenv("KET_DUP_SIZE_RATIO", "0.5")
    monkeypatch.setenv("KET_TAG_SCORE_FLOOR", "0.2")
    s = apply_env_overrides(Settings())
    assert s.pipeline.tagger_input_cache is True
    assert s.dup.bucket_pair_cap is None
    assert s.dup.size_ratio == 0.5
    assert s.tagger.score_floor == 0.2
