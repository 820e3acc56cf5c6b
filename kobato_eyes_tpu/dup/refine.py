"""Pair-level refinement (library path): SSIM + structural match decision.

Counterpart of the reference's ``src/dup/refine.py`` (SSIM >= 0.9 OR
ORB >= 0.15 decision).  SSIM parity: both images are converted to grayscale,
fitted to their common size with BICUBIC (``ImageOps.fit`` semantics) and
scored with the skimage-default SSIM implemented in ops/ssim.py.

ORB keypoint matching runs on the host via OpenCV when available (the same
binary the reference calls; crossCheck NORM_HAMMING match ratio,
refine.py:55-68) and degrades to None otherwise.  The tile-aHash structural
match (the verification the reference app ships in production,
ui/dup_refine_parallel.py) is computed as a third, device-batched signal.
The decision rule keeps the reference's OR shape:
duplicate iff ssim >= thr.ssim OR orb_ratio >= thr.orb OR
structural_ratio >= thr.structural.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np
from PIL import Image, ImageOps

from kobato_eyes_tpu.ops.ssim import ssim_batch
from kobato_eyes_tpu.ops.tile_hash import tile_ahash_batch, tile_hamming_words
from kobato_eyes_tpu.utils.image_io import safe_load_image

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class RefinementThresholds:
    """Decision thresholds (reference dup/refine.py:19-25)."""

    ssim: float = 0.9
    orb: float = 0.15
    structural: float = 0.85  # tile-hash agreement (additional signal)


@dataclass(frozen=True)
class RefinedMatch:
    file_id_a: int
    file_id_b: int
    ssim: float | None
    structural_ratio: float | None
    is_duplicate: bool
    reason: str
    orb_ratio: float | None = None  # None when OpenCV is unavailable


def compute_orb_ratio(img_a: Image.Image, img_b: Image.Image) -> float | None:
    """crossCheck ORB match ratio (reference _compute_orb_ratio semantics:
    matches / min keypoint count); None when OpenCV is absent."""
    try:
        import cv2
    except ImportError:
        return None
    gray_a = np.asarray(img_a.convert("L"))
    gray_b = np.asarray(img_b.convert("L"))
    orb = cv2.ORB_create()
    kp_a, desc_a = orb.detectAndCompute(gray_a, None)
    kp_b, desc_b = orb.detectAndCompute(gray_b, None)
    if desc_a is None or desc_b is None or not kp_a or not kp_b:
        return 0.0
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    matches = matcher.match(desc_a, desc_b)
    if not matches:
        return 0.0
    return float(len(matches) / min(len(kp_a), len(kp_b)))


def _fit_gray(img: Image.Image, size: tuple[int, int]) -> np.ndarray:
    fitted = ImageOps.fit(img.convert("L"), size, Image.Resampling.BICUBIC)
    return np.asarray(fitted, dtype=np.float32) / 255.0


def compute_ssim(img_a: Image.Image, img_b: Image.Image) -> float:
    """SSIM on the common-size grayscale pair (reference _compute_ssim)."""
    size = (min(img_a.width, img_b.width), min(img_a.height, img_b.height))
    if size[0] == 0 or size[1] == 0:
        size = (max(img_a.width, img_b.width), max(img_a.height, img_b.height))
    a = _fit_gray(img_a, size)
    b = _fit_gray(img_b, size)
    return float(np.asarray(ssim_batch(a[None], b[None]))[0])


def compute_structural_ratio(
    img_a: Image.Image, img_b: Image.Image, *, grid: int = 8, tile: int = 8
) -> float:
    """Tile-aHash agreement in 0..1 (1 = identical structure)."""
    side = grid * tile
    a = np.asarray(img_a.convert("L").resize((side, side), Image.Resampling.BILINEAR), np.uint8)
    b = np.asarray(img_b.convert("L").resize((side, side), Image.Resampling.BILINEAR), np.uint8)
    words = np.asarray(tile_ahash_batch(np.stack([a, b]), grid=grid, tile=tile))
    nbits = side * side
    dist = int(tile_hamming_words(words[0][None], words[1][None])[0])
    return 1.0 - dist / nbits


def refine_pair(
    file_id_a: int,
    file_id_b: int,
    path_a: str | Path,
    path_b: str | Path,
    *,
    thresholds: RefinementThresholds | None = None,
) -> RefinedMatch | None:
    """Compare two images; None when either fails to load."""
    image_a = safe_load_image(path_a)
    image_b = safe_load_image(path_b)
    if image_a is None or image_b is None:
        return None
    cfg = thresholds or RefinementThresholds()

    ssim_value: float | None = None
    orb_ratio: float | None = None
    structural: float | None = None
    metric_errors: list[str] = []
    try:
        ssim_value = compute_ssim(image_a, image_b)
    except Exception as exc:
        # Failure policy: metric failure degrades the decision, never raises
        # (reference refine.py:90-97).
        logger.warning("SSIM refinement failed for %s and %s: %s", path_a, path_b, exc)
        metric_errors.append("ssim unavailable")
    try:
        orb_ratio = compute_orb_ratio(image_a, image_b)
    except Exception as exc:
        logger.warning("ORB refinement failed for %s and %s: %s", path_a, path_b, exc)
        metric_errors.append("orb unavailable")
    try:
        structural = compute_structural_ratio(image_a, image_b)
    except Exception as exc:
        logger.warning("structural refinement failed for %s and %s: %s", path_a, path_b, exc)
        metric_errors.append("structural unavailable")

    reasons: list[str] = []
    is_duplicate = False
    if ssim_value is not None and ssim_value >= cfg.ssim:
        reasons.append(f"ssim>={cfg.ssim}")
        is_duplicate = True
    if orb_ratio is not None and orb_ratio >= cfg.orb:
        reasons.append(f"orb>={cfg.orb}")
        is_duplicate = True
    if structural is not None and structural >= cfg.structural:
        reasons.append(f"structural>={cfg.structural}")
        is_duplicate = True

    reason = ", ".join(reasons or metric_errors) if reasons or metric_errors else "below thresholds"
    return RefinedMatch(
        file_id_a=file_id_a,
        file_id_b=file_id_b,
        ssim=ssim_value,
        structural_ratio=structural,
        is_duplicate=is_duplicate,
        reason=reason,
        orb_ratio=orb_ratio,
    )
