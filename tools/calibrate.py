"""Threshold calibration from labeled pairs (ROC / Youden-J).

Counterpart of the reference's ``tools/calibrate_ndup.py`` (ROC threshold
suggestion for ssim/orb/cosine metrics with AUC + average precision) without
the sklearn dependency — the curves are tiny, plain numpy is enough.

Input CSV columns: ``label`` (1 = duplicate pair, 0 = not) plus one column
per metric (e.g. ``ssim,structural,cosine``).  For each metric the tool
prints AUC, average precision, and the Youden-J-optimal threshold.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

import numpy as np


def roc_curve(labels: np.ndarray, scores: np.ndarray):
    """Returns (fpr, tpr, thresholds) sweeping unique scores descending."""
    order = np.argsort(-scores, kind="stable")
    labels = labels[order]
    scores = scores[order]
    distinct = np.nonzero(np.diff(scores))[0]
    idx = np.concatenate([distinct, [len(scores) - 1]])
    tps = np.cumsum(labels)[idx]
    fps = (idx + 1) - tps
    p = labels.sum()
    n = len(labels) - p
    tpr = tps / max(p, 1)
    fpr = fps / max(n, 1)
    return (
        np.concatenate([[0.0], fpr]),
        np.concatenate([[0.0], tpr]),
        np.concatenate([[np.inf], scores[idx]]),
    )


def auc(fpr: np.ndarray, tpr: np.ndarray) -> float:
    return float(np.trapezoid(tpr, fpr))


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    order = np.argsort(-scores, kind="stable")
    labels = labels[order]
    tps = np.cumsum(labels)
    precision = tps / (np.arange(len(labels)) + 1)
    p = labels.sum()
    if p == 0:
        return 0.0
    return float((precision * labels).sum() / p)


def youden_threshold(labels: np.ndarray, scores: np.ndarray) -> tuple[float, float]:
    """(best_threshold, J) maximizing TPR - FPR."""
    fpr, tpr, thr = roc_curve(labels, scores)
    j = tpr - fpr
    best = int(np.argmax(j))
    t = thr[best]
    if not np.isfinite(t):
        t = float(scores.max())
    return float(t), float(j[best])


def calibrate(rows: list[dict[str, str]], metrics: list[str]) -> dict[str, dict[str, float]]:
    labels = np.array([int(float(r["label"])) for r in rows])
    out: dict[str, dict[str, float]] = {}
    for metric in metrics:
        scores = np.array([float(r[metric]) for r in rows if r.get(metric) not in (None, "")])
        mask = np.array([r.get(metric) not in (None, "") for r in rows])
        y = labels[mask]
        if len(np.unique(y)) < 2:
            out[metric] = {"error": 1.0}
            continue
        fpr, tpr, _ = roc_curve(y, scores)
        thr, j = youden_threshold(y, scores)
        out[metric] = {
            "auc": round(auc(fpr, tpr), 4),
            "average_precision": round(average_precision(y, scores), 4),
            "suggested_threshold": round(thr, 4),
            "youden_j": round(j, 4),
            "pairs": int(len(y)),
        }
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("csv_path", help="labeled pair CSV (label + metric columns)")
    parser.add_argument("--metrics", nargs="+", default=["ssim", "structural", "cosine"])
    args = parser.parse_args(argv)
    with Path(args.csv_path).open(newline="", encoding="utf-8") as fh:
        rows = list(csv.DictReader(fh))
    if not rows:
        print("empty CSV", file=sys.stderr)
        return 2
    present = [m for m in args.metrics if m in rows[0]]
    print(json.dumps(calibrate(rows, present), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
