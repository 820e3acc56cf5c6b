"""End-to-end tagger tests on a tiny ViT (CPU backend, fast compile)."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.models.base import TagCategory
from kobato_eyes_tpu.models.labels import synthetic_labels
from kobato_eyes_tpu.models.tagger import DummyTagger, PixaiTagger, WD14Tagger
from kobato_eyes_tpu.models.vit import vit_config


def _tiny_cfg(n_labels: int):
    return vit_config("tiny", image_size=64, patch_size=16, num_classes=n_labels)


@pytest.fixture(scope="module")
def wd14():
    labels = synthetic_labels(160)
    return WD14Tagger(labels=labels, vit=_tiny_cfg(160), image_size=64, seed=0)


def test_wd14_infer_shapes_and_policy(wd14, rng):
    imgs = [rng.integers(0, 256, size=(80, 60, 3), dtype=np.uint8) for _ in range(3)]
    results = wd14.infer_batch(imgs)
    assert len(results) == 3
    for r in results:
        assert len(r.tags) <= wd14.topk_cap
        for t in r.tags:
            # every emitted score respects the per-category threshold + floor
            thr = max(wd14.thresholds.get(int(t.category), 0.0), wd14.score_floor)
            assert t.score >= thr


def test_wd14_deterministic(wd14, rng):
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)]
    a = wd14.infer_batch(imgs)
    b = wd14.infer_batch(imgs)
    assert [(t.name, t.score) for t in a[0].tags] == [(t.name, t.score) for t in b[0].tags]


def test_pixai_budgets(rng):
    labels = synthetic_labels(160)
    tagger = PixaiTagger(
        labels=labels, vit=_tiny_cfg(160), image_size=64, seed=1,
        thresholds={0: 0.0, 4: 0.0, 3: 0.0}, max_tags={0: 5, 4: 2, 3: 2},
    )
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)]
    results = tagger.infer_batch(imgs)
    counts: dict[int, int] = {}
    for t in results[0].tags:
        counts[int(t.category)] = counts.get(int(t.category), 0) + 1
    assert counts.get(int(TagCategory.GENERAL), 0) <= 5
    assert counts.get(int(TagCategory.CHARACTER), 0) <= 2
    assert counts.get(int(TagCategory.COPYRIGHT), 0) <= 2


def test_signature_fields_stable_and_sensitive(wd14):
    sig1 = wd14.signature_fields()
    sig2 = wd14.signature_fields()
    assert sig1 == sig2
    other = WD14Tagger(
        labels=synthetic_labels(160), vit=_tiny_cfg(160), image_size=64,
        thresholds={0: 0.5},
    )
    assert other.signature_fields() != sig1


def test_dummy_tagger():
    d = DummyTagger()
    out = d.infer_batch([np.zeros((10, 10, 3), np.uint8)] * 2)
    assert len(out) == 2
    assert out[0].tags[0].name == "1girl"
    assert out[0].tags[0].score == pytest.approx(0.9)


def test_infer_batches_prepared_matches_per_batch():
    """Drain-style inference (one sync for all batches) == per-batch path."""
    import numpy as np

    from kobato_eyes_tpu.models.labels import synthetic_labels
    from kobato_eyes_tpu.models.tagger import PixaiTagger, WD14Tagger
    from kobato_eyes_tpu.models.vit import vit_config

    rng = np.random.default_rng(5)
    for cls, labels in ((WD14Tagger, 96), (PixaiTagger, 96)):
        tagger = cls(
            labels=synthetic_labels(labels),
            vit=vit_config("tiny", image_size=64, patch_size=16, num_classes=labels),
            image_size=64,
        )
        batches = [
            rng.integers(0, 256, (4, 64, 64, 3), np.uint8) for _ in range(3)
        ]
        prepared = [tagger.prepare_batch_from_rgb(list(b)) for b in batches]
        drained = tagger.infer_batches_prepared(prepared)
        single = [tagger.infer_batch_prepared(p) for p in prepared]
        assert len(drained) == len(single) == 3
        for a, b in zip(drained, single):
            assert [
                [(t.name, round(t.score, 6)) for t in img.tags] for img in a
            ] == [
                [(t.name, round(t.score, 6)) for t in img.tags] for img in b
            ]
