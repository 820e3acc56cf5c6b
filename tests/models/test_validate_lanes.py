"""PixAI + CLIP validation lanes (VERDICT r4 #3): the day real weights are
reachable, all three model families validate in one command.  These tests run
the lanes end-to-end on synthetic checkpoints."""

from __future__ import annotations

import json

import numpy as np
import pytest

from kobato_eyes_tpu.models.tagger import PixaiTagger, save_checkpoint
from kobato_eyes_tpu.models.validate import (
    _synthetic_pixai_labels,
    validate_checkpoint,
)


@pytest.fixture(scope="module")
def pixai_ckpt(tmp_path_factory):
    labels = _synthetic_pixai_labels(256)
    t = PixaiTagger(
        arch="vit", preset="tiny", image_size=64, labels=labels, fast_math=False
    )
    ckpt = tmp_path_factory.mktemp("pixai") / "ckpt"
    save_checkpoint(ckpt, t.params)
    return ckpt


def test_pixai_lane_full_report(pixai_ckpt):
    report = validate_checkpoint(
        pixai_ckpt, arch="pixai", preset="tiny", image_size=64,
        classes=256, n_images=2,
    )
    assert report["ok"] is True, report
    assert report["import"] == "orbax"
    assert report["classes"] == 256
    assert report["ips_links"] > 0, "synthetic pixai table must carry ips rows"
    assert report["ips_propagation_ok"] is True
    assert report["preprocess"]["mode"] == "pixai"
    # ImageNet statistics are the default when no preprocess.json is present
    assert report["preprocess"]["from_json"] is False
    assert report["preprocess"]["mean"] == pytest.approx([0.485, 0.456, 0.406])
    assert report["finite"] is True
    assert report["max_prob_deviation"] <= report["prob_tolerance"]


def test_pixai_preprocess_json_discovery(tmp_path, pixai_ckpt):
    """A preprocess.json next to the checkpoint overrides the statistics and
    shows up in the report + tagger signature (reference pixai_onnx.py:94-104)."""
    (pixai_ckpt / "preprocess.json").write_text(json.dumps({
        "stages": [
            {"type": "normalize", "mean": [0.5, 0.5, 0.5], "std": [0.25, 0.25, 0.25]},
        ]
    }))
    try:
        report = validate_checkpoint(
            pixai_ckpt, arch="pixai", preset="tiny", image_size=64,
            classes=256, n_images=2,
        )
        assert report["ok"] is True, report
        assert report["preprocess"]["from_json"] is True
        assert report["preprocess"]["mean"] == [0.5, 0.5, 0.5]
        assert report["preprocess"]["std"] == [0.25, 0.25, 0.25]
    finally:
        (pixai_ckpt / "preprocess.json").unlink()


def test_preprocess_json_changes_tagger_signature(tmp_path):
    """mean/std drift must invalidate stored tags exactly like a threshold
    change (pipeline fingerprint sensitivity)."""
    pj = tmp_path / "preprocess.json"
    pj.write_text(json.dumps({"stages": [
        {"type": "normalize", "mean": [0.5, 0.5, 0.5], "std": [0.2, 0.2, 0.2]},
    ]}))
    labels = _synthetic_pixai_labels(64)
    base = PixaiTagger(arch="vit", preset="tiny", image_size=64, labels=labels)
    custom = PixaiTagger(
        arch="vit", preset="tiny", image_size=64, labels=labels,
        preprocess_json=pj,
    )
    assert custom.spec.mean == (0.5, 0.5, 0.5)
    assert base.signature_fields()["prep"] != custom.signature_fields()["prep"]


def test_preprocess_json_size_mismatch_rejected(tmp_path):
    pj = tmp_path / "preprocess.json"
    pj.write_text(json.dumps({"stages": [
        {"type": "resize", "size": 448},
        {"type": "normalize", "mean": [0.5, 0.5, 0.5], "std": [0.2, 0.2, 0.2]},
    ]}))
    with pytest.raises(ValueError, match="size"):
        PixaiTagger(
            arch="vit", preset="tiny", image_size=64,
            labels=_synthetic_pixai_labels(64), preprocess_json=pj,
        )


def test_ips_probe_fails_on_broken_propagation(pixai_ckpt, monkeypatch):
    """The probe is a real check: severing the propagation flips it false."""
    from kobato_eyes_tpu.models import validate as v

    monkeypatch.setattr(
        v, "_probe_ips_propagation", lambda tagger: False
    )
    report = validate_checkpoint(
        pixai_ckpt, arch="pixai", preset="tiny", image_size=64,
        classes=256, n_images=2,
    )
    assert report["ips_propagation_ok"] is False
    assert report["ok"] is False


def test_clip_lane_full_report(tmp_path):
    from kobato_eyes_tpu.index.embedder import ImageEmbedder
    from kobato_eyes_tpu.index.validate import validate_clip_checkpoint

    emb = ImageEmbedder(
        preset="tiny", image_size=64, patch_size=32, embed_dim=128,
        clip_variant="openai",
    )
    ckpt = tmp_path / "clip_ckpt"
    save_checkpoint(ckpt, emb.params)
    report = validate_clip_checkpoint(
        ckpt, preset="tiny", image_size=64, embed_dim=128, n_images=4,
    )
    assert report["ok"] is True, report
    assert report["import"] == "orbax"
    assert report["embed_dim"] == 128
    assert report["finite"] and report["unit_norm"] and report["deterministic"]
    assert report["self_recall_at_1"] == 1.0
    assert report["max_cross_similarity"] < 0.9999


def test_clip_lane_cli(tmp_path, capsys):
    from kobato_eyes_tpu.cli import main
    from kobato_eyes_tpu.index.embedder import ImageEmbedder

    emb = ImageEmbedder(
        preset="tiny", image_size=64, patch_size=32, embed_dim=128,
        clip_variant="openai",
    )
    ckpt = tmp_path / "clip_ckpt"
    save_checkpoint(ckpt, emb.params)
    rc = main([
        "validate-checkpoint", str(ckpt), "--arch", "clip", "--preset", "tiny",
        "--image-size", "64", "--classes", "128", "--images", "4",
    ])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert report["arch"] == "clip"
    assert report["ok"] is True


def test_pixai_lane_cli(pixai_ckpt, capsys):
    from kobato_eyes_tpu.cli import main

    rc = main([
        "validate-checkpoint", str(pixai_ckpt), "--arch", "pixai",
        "--preset", "tiny", "--image-size", "64", "--classes", "256",
        "--images", "2",
    ])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert report["ips_propagation_ok"] is True
