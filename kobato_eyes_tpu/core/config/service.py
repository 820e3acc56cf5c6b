"""YAML load/save for Settings with graceful fallback.

Counterpart of the reference's ``src/core/config/service.py:31-68`` (load with
fallback to defaults on parse failure; atomic save).
"""

from __future__ import annotations

import logging
import os
import tempfile
from pathlib import Path

import yaml

from kobato_eyes_tpu.core.config.schema import Settings

logger = logging.getLogger(__name__)


def load_settings(path: str | Path | None) -> Settings:
    """Load settings from YAML; any failure yields defaults (never raises)."""
    if path is None:
        return Settings()
    p = Path(path)
    if not p.exists():
        return Settings()
    try:
        raw = yaml.safe_load(p.read_text(encoding="utf-8")) or {}
        return Settings.model_validate(raw)
    except Exception as exc:
        # Failure policy: a corrupt config file must not block startup;
        # fall back to defaults and log (reference service.py:41-53).
        logger.warning("failed to load settings from %s: %s; using defaults", p, exc)
        return Settings()


def save_settings(settings: Settings, path: str | Path) -> None:
    """Atomically persist settings as YAML."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    data = settings.model_dump(mode="json")
    fd, tmp = tempfile.mkstemp(dir=p.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            yaml.safe_dump(data, fh, sort_keys=False, allow_unicode=True)
        os.replace(tmp, p)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
