"""Scale-aware ANN index selection (the SURVEY §2.2 hnswlib row's scale story).

The native HNSW graph build is host pointer-chasing: measured ~300k vectors
before the single-core build wall stops being interactive (~30 min at 1M on
a 1-core box; docs/benchmarks.md ANN table).  The device indexes have the
opposite profile — `FlatIndex` / `IvfFlatIndex` build in seconds at 1M×512
with recall 1.0 because construction is one (masked) matmul + k-means on
the MXU.  So the build path routes by corpus size:

- ``n <= hnsw_max`` (default 300k, env ``KET_ANN_HNSW_MAX``): HNSW — best
  single-query latency, graph persists to disk, the reference's behavior.
- ``n > hnsw_max``: IVF-flat on device (exact flat below ``flat_min``) —
  the documented scale lane: HNSW's measured cap is a ledger row, not a
  skipped cell.

All three classes share the ``search(queries, k) -> (scores, ids)``
surface, so callers (cli ``ket ann``, /similar) don't branch.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_HNSW_MAX = 300_000  # measured build-wall cap (docs/benchmarks.md)
DEFAULT_FLAT_MIN = 65_536  # below this exact flat beats IVF's probe overhead


def hnsw_max_vectors() -> int:
    raw = os.environ.get("KET_ANN_HNSW_MAX", "")
    try:
        return int(raw) if raw else DEFAULT_HNSW_MAX
    except ValueError:
        logger.warning("KET_ANN_HNSW_MAX=%r not an int; using default", raw)
        return DEFAULT_HNSW_MAX


def build_auto_index(
    vectors: np.ndarray,
    ids: np.ndarray | None = None,
    *,
    hnsw_max: int | None = None,
    mesh=None,
):
    """Route to HNSW / IVF / flat by corpus size; see module docstring."""
    n = len(vectors)
    cap = hnsw_max_vectors() if hnsw_max is None else int(hnsw_max)
    if n <= cap and mesh is None:
        from kobato_eyes_tpu.index.hnsw import HnswIndex

        idx = HnswIndex(dim=int(np.asarray(vectors).shape[1]))
        idx.add(np.asarray(vectors), ids)
        return idx
    if n <= DEFAULT_FLAT_MIN:
        from kobato_eyes_tpu.index.flat import FlatIndex

        return FlatIndex(vectors, ids, mesh=mesh)
    from kobato_eyes_tpu.index.ivf import IvfFlatIndex

    logger.info(
        "ann: %d vectors > hnsw cap %d -> device IVF (recall-1.0 lane)", n, cap
    )
    return IvfFlatIndex(vectors, ids=ids, mesh=mesh)


def save_auto_index(index, path: str | Path) -> None:
    """Persist any auto-index: HNSW graph natively; device indexes as the
    (vectors, ids) npz they rebuild from in seconds (construction IS a
    device program; serializing centroids would just pin a stale quantizer).
    A sidecar ``.meta.json`` records the kind for load-time routing."""
    from kobato_eyes_tpu.index.hnsw import HnswIndex

    path = Path(path)
    if isinstance(index, HnswIndex):
        index.save(path)
        kind = "hnsw"
        normalize = True
    else:
        vecs, ids = _corpus_of(index)
        np.savez(path.with_suffix(".npz"), vectors=vecs, ids=ids)
        kind = type(index).__name__
        # FlatIndex(normalize=False) corpora must NOT be re-normalized on
        # reload; IVF always normalizes (its stored corpus is already unit)
        normalize = bool(getattr(index, "normalize", True))
    path.with_suffix(".meta.json").write_text(
        json.dumps(
            {
                "kind": kind,
                "n": len(index),
                "dim": int(index.dim),
                "normalize": normalize,
            }
        )
    )


def load_auto_index(path: str | Path, *, dim: int, mesh=None):
    """Counterpart of :func:`save_auto_index`; legacy graphs (no sidecar)
    load as plain HNSW."""
    from kobato_eyes_tpu.index.hnsw import HnswIndex

    path = Path(path)
    meta_path = path.with_suffix(".meta.json")
    meta: dict = {}
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    kind = meta.get("kind", "hnsw")
    if kind == "hnsw":
        return HnswIndex.load(path, dim=dim)
    data = np.load(path.with_suffix(".npz"))
    vectors, ids = data["vectors"], data["ids"]
    # Route by the RECORDED kind (an IvfFlatIndex saved below the flat cap —
    # or a FlatIndex above it under a custom cap — must round-trip to the
    # same class, whose recall semantics it was built with); size-based
    # routing only for sidecars written before `kind` carried device lanes.
    if kind == "FlatIndex" or (
        kind not in ("IvfFlatIndex",) and len(vectors) <= DEFAULT_FLAT_MIN
    ):
        from kobato_eyes_tpu.index.flat import FlatIndex

        return FlatIndex(
            vectors, ids, mesh=mesh, normalize=bool(meta.get("normalize", True))
        )
    from kobato_eyes_tpu.index.ivf import IvfFlatIndex

    return IvfFlatIndex(vectors, ids=ids, mesh=mesh)


def _corpus_of(index) -> tuple[np.ndarray, np.ndarray]:
    """(vectors, ids) living on the device index (unit-normalized copy)."""
    n = len(index)
    corpus = np.asarray(index._corpus_t.T if getattr(index, "_corpus_t", None) is not None
                        else index._corpus)[:n]
    return corpus.astype(np.float32), np.asarray(index.ids[:n], np.int64)
