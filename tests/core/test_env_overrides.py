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
