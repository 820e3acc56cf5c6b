"""Epoch snapshot/restore: persist device index epochs to disk.

The checkpoint story (SURVEY.md §5 checkpoint/resume): the catalog is the
durable source of truth, but a saved epoch lets a service come back up
without replaying the full build — restore, then apply deltas.  Format:
one ``.npz`` of arrays + a JSON sidecar of names/metadata.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from kobato_eyes_tpu.query.engine import TagIndexEpoch

_FORMAT_VERSION = 1


def save_epoch(epoch: TagIndexEpoch, path: str | Path) -> Path:
    """Write the epoch to ``path`` (.npz + .json sidecar). Returns the npz path."""
    base = Path(path)
    if base.suffix != ".npz":
        base = base.with_suffix(".npz")
    base.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        base,
        file_ids=epoch.file_ids,
        mtimes=epoch.mtimes,
        tag_cats=epoch.tag_cats,
        offsets=epoch.offsets,
        rows=epoch.rows_np,
        scores64=epoch.scores_np,  # f64 host copy (exact relevance ordering)
        cat_max=np.asarray(epoch.cat_max_dev),
        cat_present=np.asarray(epoch.cat_present_dev),
    )
    sidecar = base.with_suffix(".json")
    sidecar.write_text(
        json.dumps(
            {
                "format": _FORMAT_VERSION,
                "version": epoch.version,
                "built_at": epoch.built_at,
                "paths": epoch.paths,
                "tag_names": epoch.tag_names,
            }
        ),
        encoding="utf-8",
    )
    return base


def load_epoch(path: str | Path) -> TagIndexEpoch:
    base = Path(path)
    if base.suffix != ".npz":
        base = base.with_suffix(".npz")
    meta = json.loads(base.with_suffix(".json").read_text(encoding="utf-8"))
    if meta.get("format") != _FORMAT_VERSION:
        raise ValueError(f"unsupported epoch snapshot format: {meta.get('format')}")
    arrays = np.load(base)
    tag_names = list(meta["tag_names"])
    scores64 = arrays["scores64"]
    return TagIndexEpoch(
        version=int(meta["version"]),
        file_ids=arrays["file_ids"],
        mtimes=arrays["mtimes"],
        paths=list(meta["paths"]),
        tag_names=tag_names,
        tag_cats=arrays["tag_cats"],
        name_to_tid={n: i for i, n in enumerate(tag_names)},
        offsets=arrays["offsets"],
        rows_dev=jnp.asarray(arrays["rows"]),
        scores_dev=jnp.asarray(scores64.astype(np.float32)),
        rows_np=arrays["rows"],
        scores_np=scores64,
        cat_max_dev=jnp.asarray(arrays["cat_max"]),
        cat_present_dev=jnp.asarray(arrays["cat_present"]),
        built_at=float(meta["built_at"]),
    )
