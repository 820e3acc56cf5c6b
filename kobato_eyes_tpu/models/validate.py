"""One-shot checkpoint validation: import → exact-vs-fast parity → tag parity.

The day a real release checkpoint (e.g. ``wd-v1-4-swinv2-tagger-v2.onnx``,
reference ``src/tagger/wd14_onnx.py:139-202``) becomes reachable, ``ket
validate-checkpoint`` answers the three questions the repo's static-shift
episode proved cannot be answered on random weights (random init hid a
probs_err that became NaN at production bounds):

1. **Import**: does the file convert under strict manifest validation
   (every drifted key named), including constant-folded ONNX recovery?
2. **Numerics**: is the shipped fast path (Pallas attention + tanh-gelu)
   finite on real weights, and how far do its probabilities deviate from
   the exact einsum/erf forward?
3. **Tags**: do any tags actually flip across the two forwards at the
   production thresholds (the user-visible consequence of #2)?

Pure-library here; ``cli.cmd_validate_checkpoint`` is the thin shell.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Mapping

import numpy as np

logger = logging.getLogger(__name__)

# Deviation above this between exact and fast probabilities fails validation.
# The measured random-weight bound is ~0.007 (docs/benchmarks.md); real and
# adversarial weights are allowed modest headroom before we call the fast
# path unsafe for this checkpoint (tests/models/test_fastmath_adversarial.py
# pins the adversarial-weight behavior).
DEFAULT_PROB_TOLERANCE = 0.02


def _synthetic_batch(image_size: int, n: int, seed: int = 0) -> list[np.ndarray]:
    """Deterministic validation images: gradients, checkers, saturated
    blocks and dense noise — broad activation coverage without any files."""
    rng = np.random.default_rng(seed)
    out: list[np.ndarray] = []
    s = image_size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / max(s - 1, 1)
    for i in range(n):
        kind = i % 4
        if kind == 0:
            img = np.stack([xx, yy, (xx + yy) / 2], axis=-1)
        elif kind == 1:
            img = (((yy * 8).astype(int) + (xx * 8).astype(int)) % 2)[..., None]
            img = np.repeat(img.astype(np.float32), 3, axis=-1)
        elif kind == 2:
            img = np.zeros((s, s, 3), np.float32)
            img[:, : s // 2, 0] = 1.0
            img[s // 2 :, :, 2] = 1.0
        else:
            img = rng.uniform(0, 1, size=(s, s, 3)).astype(np.float32)
        out.append((img * 255).astype(np.uint8))
    return out


def validate_checkpoint(
    path: str | Path,
    *,
    arch: str = "swinv2",
    preset: str = "base",
    image_size: int = 448,
    classes: int | None = None,
    labels_path: str | Path | None = None,
    thresholds: Mapping[int, float] | None = None,
    n_images: int = 8,
    prob_tolerance: float = DEFAULT_PROB_TOLERANCE,
) -> dict[str, Any]:
    """Run the full import → parity → tag-flip pipeline; returns a report.

    ``path`` may be a torch state dict (.pth/.pt), .safetensors, .onnx, or
    an already-converted orbax checkpoint directory.  The report's ``ok``
    is True iff the import validated strictly, both forwards are finite,
    and the max per-label probability deviation is within tolerance; tag
    flips are REPORTED (count + names) but only fail when a flipped score
    sits further than the tolerance from its threshold (a flip within the
    band is the documented cross-backend behavior, not a defect).
    """
    from kobato_eyes_tpu.models.labels import load_labels, synthetic_labels
    from kobato_eyes_tpu.models.tagger import WD14Tagger, load_checkpoint

    path = Path(path)
    report: dict[str, Any] = {"path": str(path), "arch": arch, "preset": preset}

    if labels_path is not None:
        labels = load_labels(labels_path)
    else:
        labels = synthetic_labels(int(classes or 1024))
    n_classes = len(labels)
    report["classes"] = n_classes

    # --- 1. import (strict manifests; folded-ONNX recovery inside) --------
    if path.is_dir():  # orbax checkpoint directory
        params = load_checkpoint(path)
        report["import"] = "orbax"
    else:
        from kobato_eyes_tpu.models.import_weights import import_torch_checkpoint

        if arch == "swinv2":
            from kobato_eyes_tpu.models.swin import swin_config

            cfg = swin_config(preset, image_size=image_size, num_classes=n_classes)
        else:
            from kobato_eyes_tpu.models.vit import vit_config

            cfg = vit_config(preset, image_size=image_size, num_classes=n_classes)
        params = import_torch_checkpoint(str(path), cfg)  # raises with keys named
        report["import"] = "strict-manifest-ok"

    common = dict(
        labels=labels, arch=arch, preset=preset, image_size=image_size,
        params=params, thresholds=dict(thresholds) if thresholds else None,
    )
    exact = WD14Tagger(fast_math=False, **common)
    fast = WD14Tagger(fast_math=True, **common)
    report["fast_path"] = {
        "attn_impl": fast.cfg.attn_impl, "act": fast.cfg.act,
    }

    # --- 2. exact-vs-fast forward parity ----------------------------------
    images = _synthetic_batch(image_size, n_images)
    batch = exact.prepare_batch_from_rgb(images)
    p_exact = np.asarray(exact.forward_probs(batch), np.float32)
    p_fast = np.asarray(fast.forward_probs(batch), np.float32)
    finite = bool(np.isfinite(p_exact).all() and np.isfinite(p_fast).all())
    dev = float(np.max(np.abs(p_exact - p_fast))) if finite else float("nan")
    report["finite"] = finite
    report["max_prob_deviation"] = dev
    report["prob_tolerance"] = float(prob_tolerance)

    # --- 3. tag parity at production thresholds ---------------------------
    thr_vec = exact._thr_vec_np  # includes the score floor
    hits_exact = p_exact >= thr_vec[None, :]
    hits_fast = p_fast >= thr_vec[None, :]
    flips = np.nonzero(hits_exact != hits_fast)
    flip_rows = []
    out_of_band = 0
    for img_i, lab_i in zip(*flips):
        gap = float(
            max(abs(p_exact[img_i, lab_i] - thr_vec[lab_i]),
                abs(p_fast[img_i, lab_i] - thr_vec[lab_i]))
        )
        if gap > prob_tolerance:
            out_of_band += 1
        flip_rows.append({
            "image": int(img_i),
            "tag": exact.names[int(lab_i)],
            "exact": round(float(p_exact[img_i, lab_i]), 5),
            "fast": round(float(p_fast[img_i, lab_i]), 5),
            "threshold": round(float(thr_vec[lab_i]), 5),
        })
    report["tag_flips"] = len(flip_rows)
    report["tag_flips_out_of_band"] = out_of_band
    report["tag_flip_examples"] = flip_rows[:10]

    report["ok"] = bool(finite and dev <= prob_tolerance and out_of_band == 0)
    return report
