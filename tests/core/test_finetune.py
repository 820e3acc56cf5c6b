"""Fine-tune loop: catalog labels -> training -> loadable checkpoint."""

from __future__ import annotations

import numpy as np
import pytest

from kobato_eyes_tpu.core.config.schema import PipelineSettings, Settings
from kobato_eyes_tpu.core.finetune import finetune_from_catalog
from kobato_eyes_tpu.core.pipeline import run_index_once
from kobato_eyes_tpu.db.connection import reset_bootstrap_cache
from kobato_eyes_tpu.models.tagger import DummyTagger, WD14Tagger

pytestmark = pytest.mark.integration


def test_finetune_end_to_end(tmp_path, image_dir):
    reset_bootstrap_cache()
    root, paths = image_dir
    db = tmp_path / "t.sqlite"
    settings = Settings(pipeline=PipelineSettings(roots=[root], batch_size=2, io_workers=2))
    run_index_once(db, settings, DummyTagger())  # labels every file "1girl"

    out = tmp_path / "ckpt" / "model"
    result = finetune_from_catalog(
        db, preset="tiny", image_size=32, epochs=4, batch_size=2,
        learning_rate=3e-3, checkpoint_out=out, io_workers=2,
        vit_overrides=dict(patch_size=16, hidden_dim=64, depth=2,
                           num_heads=4, mlp_dim=128),
    )
    assert result.files == len(paths)
    assert result.labels == 1  # one tag in the dummy-labeled catalog
    assert result.steps >= 4
    assert result.final_loss is not None and result.first_loss is not None
    assert result.final_loss < result.first_loss  # it learned something
    assert result.checkpoint and result.labels_csv

    # the artifact triple (checkpoint, labels, config) loads straight back
    import json

    from kobato_eyes_tpu.models.vit import ViTConfig

    arch = json.loads((out.parent / "model_config.json").read_text())
    assert arch.pop("arch") == "vit"
    arch.pop("dtype", None), arch.pop("param_dtype", None), arch.pop("pool", None)
    arch.pop("remat", None)
    tagger = WD14Tagger(
        labels_path=result.labels_csv, checkpoint_path=result.checkpoint,
        vit=ViTConfig(**arch),
    )
    assert tagger.names == ["1girl"]
    out_tags = tagger.infer_batch(
        [np.zeros((32, 32, 3), np.uint8)], thresholds={0: 0.0}
    )
    assert len(out_tags) == 1  # forward runs with the restored weights


def test_finetune_empty_catalog(tmp_path):
    reset_bootstrap_cache()
    db = tmp_path / "empty.sqlite"
    from kobato_eyes_tpu.db.connection import bootstrap

    bootstrap(db).close()
    result = finetune_from_catalog(db, preset="tiny", image_size=32, epochs=1)
    assert result.steps == 0 and result.checkpoint is None
