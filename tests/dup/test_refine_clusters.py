"""End-to-end refinement tests over real image files."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from kobato_eyes_tpu.dup.cluster import ClusterBuilder
from kobato_eyes_tpu.dup.refine import RefinementThresholds, refine_pair
from kobato_eyes_tpu.dup.refine_clusters import refine_by_pixels, refine_by_tilehash
from kobato_eyes_tpu.dup.types import DuplicateCluster, DuplicateClusterEntry, DuplicateFileMeta


def _save(tmp_path: Path, name: str, arr: np.ndarray) -> Path:
    p = tmp_path / name
    Image.fromarray(arr, "RGB").save(p)
    return p


def _meta(fid: int, path: Path) -> DuplicateFileMeta:
    size = path.stat().st_size if path.exists() else 0
    return DuplicateFileMeta(
        file_id=fid, path=path, size=size, width=64, height=64, phash=0
    )


def _smooth_rgb(rng: np.random.Generator, h: int = 64, w: int = 64, phase: float = 0.0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    lum = 120 + 90 * np.sin(xx / 9.0 + phase) * np.cos(yy / 7.0)
    rgb = np.stack([lum, np.roll(lum, 3, 0), np.roll(lum, 5, 1)], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


@pytest.fixture
def cluster_with_outlier(tmp_path, rng):
    base = _smooth_rgb(rng)
    near = np.clip(base.astype(np.float32) * 1.05, 0, 255).astype(np.uint8)  # brightness edit
    outlier = _smooth_rgb(rng, phase=2.3)
    p_keep = _save(tmp_path, "keep.png", base)
    p_near = _save(tmp_path, "near.png", near)
    p_out = _save(tmp_path, "outlier.png", outlier)
    entries = [
        DuplicateClusterEntry(file=_meta(1, p_keep), best_hamming=0),
        DuplicateClusterEntry(file=_meta(2, p_near), best_hamming=1),
        DuplicateClusterEntry(file=_meta(3, p_out), best_hamming=8),
    ]
    return DuplicateCluster(files=entries, keeper_id=1)


def test_tilehash_refine_drops_outlier(cluster_with_outlier):
    # brightness-edited near-dup sits at tile-hamming ~34, the unrelated
    # image at ~2900; any threshold between separates them
    out = refine_by_tilehash([cluster_with_outlier], grid=8, tile=8, max_bits=100)
    assert len(out) == 1
    assert [e.file.file_id for e in out[0].files] == [1, 2]
    assert out[0].keeper_id == 1


def test_pixel_refine_drops_outlier(cluster_with_outlier):
    # the 1.05x brightness edit sits at MAE ~0.024; the unrelated image far above
    out = refine_by_pixels([cluster_with_outlier], mae_thr=0.035)
    assert len(out) == 1
    assert [e.file.file_id for e in out[0].files] == [1, 2]


def test_refine_cluster_all_dropped(cluster_with_outlier, tmp_path, rng):
    # threshold 0 keeps only the keeper itself -> cluster dissolves (<2)
    out = refine_by_pixels([cluster_with_outlier], mae_thr=0.0)
    assert out == []


def test_refine_missing_keeper_file(tmp_path, rng, cluster_with_outlier):
    # keeper path doesn't exist -> cluster dropped, no exception
    ghost = DuplicateClusterEntry(
        file=_meta(9, tmp_path / "missing.png"), best_hamming=0
    )
    cl = DuplicateCluster(files=[ghost, cluster_with_outlier.files[1]], keeper_id=9)
    assert refine_by_tilehash([cl]) == []
    assert refine_by_pixels([cl]) == []


def test_refine_cancellation(cluster_with_outlier):
    assert refine_by_tilehash([cluster_with_outlier], is_cancelled=lambda: True) == []
    assert refine_by_pixels([cluster_with_outlier], is_cancelled=lambda: True) == []


def test_refine_pair_and_cluster_builder(tmp_path, rng):
    base = rng.integers(0, 256, size=(96, 80, 3), dtype=np.uint8)
    near = np.clip(base.astype(np.int16) + rng.integers(-2, 3, base.shape), 0, 255).astype(np.uint8)
    # the unrelated image must be a smooth gradient, not iid noise: real ORB
    # (faithful to the reference) cross-matches random-noise textures at high
    # ratios, which is reference behavior, not a bug in our port
    yy, xx = np.mgrid[0:96, 0:80]
    far = np.stack([(yy * 2) % 256, (xx * 3) % 256, ((yy + xx)) % 256], axis=-1).astype(np.uint8)
    p1 = _save(tmp_path, "a.png", base)
    p2 = _save(tmp_path, "b.png", near)
    p3 = _save(tmp_path, "c.png", far)

    m12 = refine_pair(1, 2, p1, p2)
    m13 = refine_pair(1, 3, p1, p3)
    assert m12 is not None and m12.is_duplicate
    assert m12.ssim is not None and m12.ssim >= 0.9
    assert m13 is not None and not m13.is_duplicate

    builder = ClusterBuilder()
    builder.add_match(m12)
    builder.add_match(m13)
    clusters = builder.build()
    assert len(clusters) == 1
    assert clusters[0].representative == 1
    assert clusters[0].members == [1, 2]
    assert len(clusters[0].matches) == 1


def test_refine_pair_unloadable_returns_none(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    good = tmp_path / "ok.png"
    Image.new("RGB", (32, 32), (10, 20, 30)).save(good)
    assert refine_pair(1, 2, bad, good) is None


def test_orb_ratio_real_cv2(rng):
    """True ORB parity: identical images match strongly, noise doesn't."""
    pytest.importorskip("cv2")
    from PIL import Image

    from kobato_eyes_tpu.dup.refine import compute_orb_ratio

    base = np.random.default_rng(3).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    img = Image.fromarray(base, "RGB").resize((256, 256), Image.Resampling.BICUBIC)
    same = compute_orb_ratio(img, img)
    assert same is not None and same > 0.5

    other_arr = np.random.default_rng(99).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    other = Image.fromarray(other_arr, "RGB").resize((256, 256), Image.Resampling.BICUBIC)
    diff = compute_orb_ratio(img, other)
    assert diff is not None and diff < same


def test_refine_pair_degraded_metric_scores_none(tmp_path, monkeypatch):
    """A raising metric degrades to None with a reason, never aborts the pair
    (reference failure policy: per-item data errors are skips)."""
    from PIL import Image

    import kobato_eyes_tpu.dup.refine as refine_mod
    from kobato_eyes_tpu.dup.refine import refine_pair

    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    Image.new("RGB", (16, 16), (200, 10, 10)).save(a)
    Image.new("RGB", (16, 16), (200, 10, 10)).save(b)

    def boom(img_a, img_b):
        raise RuntimeError("metric exploded")

    monkeypatch.setattr(refine_mod, "_METRICS", (
        ("ssim", boom, lambda t: t.ssim),
        ("orb_ratio", refine_mod.compute_orb_ratio, lambda t: t.orb),
        ("structural_ratio", boom, lambda t: t.structural),
    ))
    m = refine_pair(1, 2, a, b)
    assert m is not None
    assert m.ssim is None and m.structural_ratio is None
    # identical images: ORB may or may not clear its bar; if nothing hits,
    # the reason must name the degraded metrics
    if not m.is_duplicate:
        assert "degraded" in m.reason and "ssim" in m.reason


def test_refine_pair_orb_none_when_cv2_missing(tmp_path, monkeypatch):
    import sys

    from PIL import Image

    from kobato_eyes_tpu.dup.refine import compute_orb_ratio

    img = Image.new("RGB", (32, 32))
    monkeypatch.setitem(sys.modules, "cv2", None)
    assert compute_orb_ratio(img, img) is None


def test_ssim_zero_size_image_guard():
    from PIL import Image

    from kobato_eyes_tpu.dup.refine import compute_ssim

    a = Image.new("RGB", (0, 8))
    b = Image.new("RGB", (8, 8))
    val = compute_ssim(a, b)  # common-size guard: falls back to max dims
    assert val == val  # not NaN, no exception
