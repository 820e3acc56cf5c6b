"""Shared pipeline data contracts (reference ``core/pipeline/contracts.py``)."""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class FileRecord:
    """Mutable per-file state threaded through the stages
    (reference types.py _FileRecord)."""

    file_id: int
    path: Path
    size: int
    mtime: float
    width: int | None = None
    height: int | None = None
    needs_tagging: bool = False
    content_changed: bool = False  # new file or bytes changed (sha mismatch)
    touched: bool = False  # size/mtime moved (content may be identical)
    tagged: bool = False
    failed: bool = False


@dataclass(frozen=True)
class WriteItem:
    """One file's tagging result bound for the catalog (reference DBItem)."""

    file_id: int
    tags: list[tuple[str, float, int]]  # (name, score, category)
    width: int | None
    height: int | None
    tagger_sig: str
    tagged_at: float


@dataclass(frozen=True)
class WriteFlush:
    """Queue sentinel: flush buffered items now."""


@dataclass(frozen=True)
class WriteStop:
    """Queue sentinel: flush then stop the writer."""

    flush: bool = True


@dataclass
class ScanResult:
    records: list[FileRecord] = field(default_factory=list)
    new: int = 0
    changed: int = 0
    missing_ids: list[int] = field(default_factory=list)
