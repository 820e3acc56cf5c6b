"""Host pipeline for batched signature computation.

Replaces the reference's per-file ProcessPoolExecutor fan-out
(``src/core/fastsig.py:65-99``) with: a thread pool decoding + downsampling
images on the host (PIL, identical grayscale/LANCZOS front end to the
reference formula) and a single batched device kernel computing all pHash /
dHash words per chunk on the MXU/VPU (ops/phash.py).
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable, Sequence

import numpy as np
from PIL import Image

from kobato_eyes_tpu.ops.phash import dhash_batch, phash_batch
from kobato_eyes_tpu.utils.bits import to_signed64, u32pair_to_u64
from kobato_eyes_tpu.utils.image_io import gray_resized, safe_load_image

logger = logging.getLogger(__name__)

_LANCZOS = Image.Resampling.LANCZOS


@dataclass
class SignatureBatch:
    """Signatures for a batch of files; hashes are signed-64 ints (storage form)."""

    file_ids: list[int]
    phash: list[int]
    dhash: list[int]
    failed_ids: list[int]


def _decode_one(path: str | Path) -> tuple[np.ndarray, np.ndarray] | None:
    img = safe_load_image(path)
    if img is None:
        return None
    g32 = gray_resized(img, (32, 32), _LANCZOS)
    g98 = gray_resized(img, (9, 8), _LANCZOS)  # PIL size=(w=9,h=8) -> array (8,9)
    return g32, g98


def hash_images(images: Sequence[Image.Image]) -> tuple[np.ndarray, np.ndarray]:
    """PIL images -> (phash_pairs, dhash_pairs) as (N, 2) uint32 arrays."""
    g32 = np.stack([gray_resized(im, (32, 32), _LANCZOS) for im in images])
    g98 = np.stack([gray_resized(im, (9, 8), _LANCZOS) for im in images])
    ph = np.asarray(phash_batch(g32))
    dh = np.asarray(dhash_batch(g98))
    return ph, dh


def phash_image(image: Image.Image) -> int:
    """Single-image pHash64 as a signed-64 int (reference-compatible)."""
    ph, _ = hash_images([image])
    return to_signed64(int(u32pair_to_u64(ph)[0]))


def dhash_image(image: Image.Image) -> int:
    _, dh = hash_images([image])
    return to_signed64(int(u32pair_to_u64(dh)[0]))


# -- fused-lane split (dispatch/complete) -----------------------------------
# The index pipeline's tag stage chains signature hashing onto each batch's
# already-decoded pixels (core/pipeline/tag_stage.py): dispatch queues the
# two device kernels WITHOUT syncing so the bounded in-flight window covers
# them, complete fetches both words in one device_get. Same kernels as the
# standalone lane below => fused hashes are bit-identical by construction.


def gray_pair_from_rgb(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decoded (H, W, 3) uint8 RGB -> the (32,32) and (8,9) float32 grayscale
    tiles the hash kernels consume. PIL round-trip keeps the ITU-R 601-2
    grayscale + LANCZOS front end identical to ``_decode_one``."""
    img = Image.fromarray(arr)
    return (
        gray_resized(img, (32, 32), _LANCZOS),
        gray_resized(img, (9, 8), _LANCZOS),
    )


def dispatch_hash_batch(g32: np.ndarray, g98: np.ndarray) -> tuple:
    """Queue pHash + dHash device kernels without syncing."""
    return phash_batch(g32), dhash_batch(g98)


def complete_hash_batch(pending: tuple) -> tuple[list[int], list[int]]:
    """Fetch a dispatched hash pair -> (phash, dhash) signed-64 lists."""
    import jax

    ph_pairs, dh_pairs = jax.device_get(pending)
    ph = u32pair_to_u64(np.asarray(ph_pairs))
    dh = u32pair_to_u64(np.asarray(dh_pairs))
    return (
        [to_signed64(int(v)) for v in ph],
        [to_signed64(int(v)) for v in dh],
    )


def compute_signatures(
    items: Iterable[tuple[int, str | Path]],
    *,
    batch_size: int = 1024,
    io_workers: int = 8,
    progress: Callable[[int, int], None] | None = None,
    is_cancelled: Callable[[], bool] | None = None,
) -> SignatureBatch:
    """Compute (phash, dhash) for (file_id, path) pairs.

    Decode failures are per-item skips, never fatal (failure policy of
    reference fastsig/_compute_worker).  Progress is reported per completed
    batch.
    """
    pending = list(items)
    total = len(pending)
    out = SignatureBatch(file_ids=[], phash=[], dhash=[], failed_ids=[])
    done = 0
    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        for start in range(0, total, batch_size):
            if is_cancelled is not None and is_cancelled():
                break
            chunk = pending[start : start + batch_size]
            decoded = list(pool.map(lambda it: (it[0], _decode_one(it[1])), chunk))
            ok = [(fid, g) for fid, g in decoded if g is not None]
            out.failed_ids.extend(fid for fid, g in decoded if g is None)
            if ok:
                g32 = np.stack([g[0] for _, g in ok])
                g98 = np.stack([g[1] for _, g in ok])
                ph = u32pair_to_u64(np.asarray(phash_batch(g32)))
                dh = u32pair_to_u64(np.asarray(dhash_batch(g98)))
                out.file_ids.extend(fid for fid, _ in ok)
                out.phash.extend(to_signed64(int(v)) for v in ph)
                out.dhash.extend(to_signed64(int(v)) for v in dh)
            done += len(chunk)
            if progress is not None:
                progress(done, total)
    return out
