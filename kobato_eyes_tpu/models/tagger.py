"""JAX taggers: WD14-class and PixAI-class multi-label image classifiers.

TPU-native replacement for the ONNX-Runtime taggers
(``src/tagger/wd14_onnx.py:106``, ``src/tagger/pixai_onnx.py:24``).  One
jitted program per batch shape runs: uint8 device upload -> normalization ->
ViT forward -> prob conversion -> threshold mask -> top-K.  Only the final
budget walk over <=128 candidates happens on host.

Weights come from an orbax/msgpack checkpoint or random init (for benchmark
and test runs); the scoring *policy* (thresholds, floors, caps, budgets,
ips propagation) is bit-parity with the reference regardless of weights.
"""

from __future__ import annotations

import hashlib
import json
import logging
from functools import partial
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kobato_eyes_tpu.models.base import (
    DEFAULT_SCORE_FLOOR,
    DEFAULT_TOPK_CAP,
    MaxTagsMap,
    PIXAI_DEFAULT_MAX_TAGS,
    PIXAI_DEFAULT_THRESHOLDS,
    TagResult,
    ThresholdMap,
    WD14_DEFAULT_THRESHOLDS,
)
from kobato_eyes_tpu.models.labels import TagMeta, load_labels, synthetic_labels
from kobato_eyes_tpu.models.postprocess import (
    build_threshold_vector,
    probs_from_logits,
    resolve_limits,
    select_pixai,
    select_wd14,
    topk_hits,
    topk_hits_by_category,
)
from kobato_eyes_tpu.models.preprocess import PreprocessSpec, normalize_on_device, prepare_batch
from kobato_eyes_tpu.models.vit import ViT, ViTConfig, init_params, vit_config

logger = logging.getLogger(__name__)


class JaxTagger:
    """Shared machinery for WD14/PixAI-style taggers."""

    mode: str = "wd14"
    default_thresholds: dict[int, float] = WD14_DEFAULT_THRESHOLDS
    default_max_tags: dict[int, int | None] = {}

    def __init__(
        self,
        *,
        labels: Sequence[TagMeta] | None = None,
        labels_path: str | Path | None = None,
        vit: ViTConfig | None = None,
        swin: Any = None,  # SwinConfig overrides arch="swinv2"
        arch: str = "vit",  # "vit" | "swinv2" (the WD14 family's actual arch)
        preset: str = "base",
        params: Any = None,
        checkpoint_path: str | Path | None = None,
        image_size: int = 448,
        score_floor: float = DEFAULT_SCORE_FLOOR,
        topk_cap: int = DEFAULT_TOPK_CAP,
        thresholds: ThresholdMap | None = None,
        max_tags: MaxTagsMap | None = None,
        tag_map_path: str | Path | None = None,
        preprocess_json: str | Path | None = None,
        seed: int = 0,
        mesh: Any = None,
        bf16_params: bool = False,
        fast_math: bool | None = None,
    ) -> None:
        """``fast_math``: use the profiled-fast ViT forward on TPU — the
        head-resident Pallas attention kernel plus tanh-gelu (measured
        84 -> 50 ms per ViT-B/448 batch-32 step, 31% -> 51% MFU; max
        per-label probability deviation vs the exact forward ~= 0.007).
        ``None`` (default) auto-enables it on the TPU backend only; pass
        ``False`` for bit-parity with the exact einsum/erf forward.
        Only applies to explicitly-passed ``vit`` configs if they left the
        knobs at their defaults.
        """
        if labels is None and labels_path is not None:
            labels = load_labels(labels_path)
        if labels is None:
            labels = synthetic_labels(1024)
        labels = list(labels)
        if self.mode == "pixai":
            # Label-ORDER verification/repair against the tag_map JSON — the
            # authority on output-index order (reference pixai_onnx.py:109-167)
            from kobato_eyes_tpu.models.labels import (
                discover_tag_map_json,
                verify_label_order,
            )

            tm = tag_map_path
            if tm is None and labels_path is not None:
                tm = discover_tag_map_json(labels_path)
            if tm is not None:
                labels, n_fixed = verify_label_order(labels, tm)
                if n_fixed:
                    logger.warning("pixai label table repaired: %d rows", n_fixed)
        self.labels: list[TagMeta] = labels
        self.names: list[str] = [m.name for m in self.labels]
        self.cats: np.ndarray = np.array([int(m.category) for m in self.labels], dtype=np.int32)
        self._tag_meta = {m.name: m for m in self.labels}
        self._name_to_idx = {m.name: i for i, m in enumerate(self.labels)}

        if swin is not None:
            self.arch = "swinv2"
        elif vit is not None:
            self.arch = "vit"
        else:
            self.arch = arch
        if fast_math is None:
            fast_math = jax.default_backend() == "tpu"
            if fast_math:
                # threshold-tuning runs must know WHICH forward they measured:
                # the fast path deviates up to ~0.007 in per-label probability
                # vs the exact einsum/gelu forward (docs/benchmarks.md), which
                # can flip tags near thresholds across backends
                logger.info(
                    "fast_math auto-enabled on TPU (pallas attention + "
                    "tanh-gelu); pass fast_math=False for the exact forward"
                )
        if self.arch == "swinv2":
            from kobato_eyes_tpu.models.swin import swin_config

            self.cfg = swin or swin_config(
                preset, image_size=image_size, num_classes=len(self.labels)
            )
        else:
            self.cfg = vit or vit_config(preset, image_size=image_size, num_classes=len(self.labels))
        if fast_math and self.cfg.attn_impl == "einsum" and self.cfg.act == "gelu":
            import dataclasses as _dc

            self.cfg = _dc.replace(self.cfg, attn_impl="pallas", act="gelu_tanh")
        if self.cfg.num_classes != len(self.labels):
            raise ValueError(
                f"model head ({self.cfg.num_classes}) != label count ({len(self.labels)})"
            )
        # mean/std from a PixAI-style preprocess.json (reference
        # pixai_onnx.py:94-104: the release ships normalization statistics
        # next to the model).  Explicit path wins; otherwise auto-discovered
        # next to the checkpoint for pixai-mode taggers.
        if preprocess_json is None and self.mode == "pixai" and checkpoint_path:
            cand = Path(checkpoint_path)
            cand = (cand if cand.is_dir() else cand.parent) / "preprocess.json"
            if cand.exists():
                preprocess_json = cand
        if preprocess_json is not None:
            from kobato_eyes_tpu.models.preprocess import spec_from_preprocess_json

            self.spec = spec_from_preprocess_json(
                preprocess_json, mode=self.mode, size=self.cfg.image_size
            )
            if self.spec.size != self.cfg.image_size:
                raise ValueError(
                    f"preprocess.json size {self.spec.size} != model input "
                    f"size {self.cfg.image_size}"
                )
        else:
            self.spec = PreprocessSpec(mode=self.mode, size=self.cfg.image_size)
        self.score_floor = float(score_floor)
        self.topk_cap = int(topk_cap)
        self.thresholds: dict[int, float] = dict(self.default_thresholds)
        if thresholds:
            self.thresholds.update({int(k): float(v) for k, v in thresholds.items()})
        self.max_tags: dict[int, int | None] = resolve_limits(self.default_max_tags, max_tags)
        self._thr_vec_np = build_threshold_vector(
            self.cats, self.thresholds, score_floor=self.score_floor
        )
        self._cat_vec_dev = jnp.asarray(self.cats)
        self._thr_dev_cache: tuple[int, Any] | None = None

        if self.arch == "swinv2":
            from kobato_eyes_tpu.models.swin import SwinV2, init_swin_params

            self._model = SwinV2(self.cfg)
            _init = init_swin_params
        else:
            self._model = ViT(self.cfg)
            _init = init_params
        self._checkpoint_path = Path(checkpoint_path) if checkpoint_path else None
        if params is not None:
            self.params = params
        elif self._checkpoint_path is not None:
            self.params = load_checkpoint(self._checkpoint_path)
        else:
            logger.info(
                "tagger %s: random-init weights (%d labels, %s/%s preset)",
                self.mode, len(self.labels), self.arch, preset,
            )
            self.params = _init(self.cfg, seed=seed)

        # Inference-only bf16 weights: params live in bf16 and the module's
        # param_dtype matches, so the compiled forward carries no per-layer
        # f32->bf16 weight-cast fusions (measured ~15% of the on-device time
        # for ViT-B/448) and weight HBM traffic halves.  Off by default —
        # golden-parity tests and training load f32.
        if bf16_params:
            import dataclasses as _dc

            self.cfg = _dc.replace(self.cfg, param_dtype=jnp.bfloat16)
            self._model = type(self._model)(self.cfg)
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                self.params,
            )

        # Multi-chip: partition params over the mesh (tensor-parallel rules
        # from parallel/mesh.py, replicated elsewhere); batches get sharded
        # on the data axis per forward call. GSPMD inserts the collectives.
        self._mesh = mesh
        if mesh is not None:
            from kobato_eyes_tpu.parallel.mesh import place_params, shard_batch

            self.params = place_params(self.params, mesh)
            self._batch_sharding = shard_batch(mesh)
        else:
            self._batch_sharding = None

    # -- identity ---------------------------------------------------------

    @property
    def input_size(self) -> int:
        return self.cfg.image_size

    def signature_fields(self) -> dict[str, str]:
        """Stable fingerprint inputs (reference core/pipeline/signature.py:40-66)."""
        label_digest = hashlib.sha256(
            "\n".join(f"{m.name}:{int(m.category)}" for m in self.labels).encode()
        ).hexdigest()[:16]
        if self.arch == "swinv2":
            arch = (
                f"swinv2-e{self.cfg.embed_dim}-d{'.'.join(map(str, self.cfg.depths))}"
                f"-w{self.cfg.window_size}-{self.cfg.image_size}"
            )
        else:
            arch = f"vit-d{self.cfg.depth}-h{self.cfg.hidden_dim}-p{self.cfg.patch_size}-{self.cfg.image_size}"
        return {
            "name": self.mode,
            "arch": arch,
            "labels": label_digest,
            "ckpt": str(self._checkpoint_path or "random"),
            "thr": json.dumps(self.thresholds, sort_keys=True),
            "max": json.dumps({k: v for k, v in self.max_tags.items()}, sort_keys=True),
            "floor": repr(self.score_floor),
            "cap": str(self.topk_cap),
            # pixel-prep convention: a preprocess.json mean/std change must
            # invalidate stored tags exactly like a threshold change would
            "prep": f"{self.spec.mode}:{self.spec.size}:"
                    f"{self.spec.mean}:{self.spec.std}",
        }

    # -- host prepare -----------------------------------------------------

    def prepare_batch_from_rgb(self, images: Sequence[np.ndarray]) -> np.ndarray:
        return prepare_batch(list(images), self.spec)

    # -- device forward ---------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _forward_probs(self, params: Any, batch_u8: jnp.ndarray) -> jnp.ndarray:
        x = normalize_on_device(batch_u8, self.spec)
        logits = self._model.apply({"params": params}, x)
        return probs_from_logits(logits)

    def forward_probs(self, batch_u8: np.ndarray) -> jnp.ndarray:
        batch = jnp.asarray(batch_u8)
        if self._batch_sharding is not None:
            pad = -batch.shape[0] % self._mesh.shape["data"]
            if pad:
                batch = jnp.concatenate([batch, jnp.zeros((pad, *batch.shape[1:]), batch.dtype)])
            batch = jax.device_put(batch, self._batch_sharding)
            probs = self._forward_probs(self.params, batch)
            return probs[: batch.shape[0] - pad] if pad else probs
        return self._forward_probs(self.params, batch)

    # -- full inference ---------------------------------------------------

    def infer_batch_prepared(
        self,
        batch: np.ndarray,
        *,
        thresholds: ThresholdMap | None = None,
        max_tags: MaxTagsMap | None = None,
    ) -> list[TagResult]:
        thr_vec = (
            self._thr_vec_np
            if thresholds is None
            else build_threshold_vector(
                self.cats,
                {**self.thresholds, **{int(k): float(v) for k, v in thresholds.items()}},
                score_floor=self.score_floor,
            )
        )
        limits = resolve_limits(self.max_tags, max_tags)
        import time as _time

        from kobato_eyes_tpu.utils.metrics import metrics as _metrics

        t0 = _time.perf_counter()
        probs = self.forward_probs(batch)
        probs.block_until_ready()
        t1 = _time.perf_counter()
        results = self._select(probs, thr_vec, limits, thresholds)
        t2 = _time.perf_counter()
        # per-batch timing line (reference wd14_onnx.py:464-472 `ort=…ms
        # post=…ms imgs/s` instrumentation)
        n = batch.shape[0]
        _metrics.observe("tagger.infer", t1 - t0)
        _metrics.observe("tagger.post", t2 - t1)
        logger.debug(
            "%s batch=%d infer=%.1fms post=%.1fms imgs/s=%.1f",
            self.mode, n, (t1 - t0) * 1e3, (t2 - t1) * 1e3, n / max(t2 - t0, 1e-9),
        )
        return results

    def _thr_dev(self, thr_vec: np.ndarray) -> jnp.ndarray:
        """Device copy of the threshold vector, cached by object identity —
        the long-lived default vector would otherwise re-upload (one relay
        round trip) every batch.  The cache holds a STRONG reference to the
        keyed array: an id()-keyed cache without one can serve a previous
        call's thresholds after the allocator reuses the freed address."""
        if self._thr_dev_cache is None or self._thr_dev_cache[0] is not thr_vec:
            self._thr_dev_cache = (thr_vec, jnp.asarray(thr_vec))
        return self._thr_dev_cache[1]

    # The select is split device/host so many batches can share ONE sync
    # (infer_batches_prepared): through a relay each fetch is its own round
    # trip — a fused device_get was measured 3x faster than per-array
    # np.asarray even for a single batch.

    def _select_device(self, probs: jnp.ndarray, thr_vec: np.ndarray, limits) -> tuple:
        return topk_hits(probs, self._thr_dev(thr_vec), k=min(self.topk_cap, probs.shape[1]))

    def _select_host(self, fetched: tuple, limits, thresholds: ThresholdMap | None) -> list[TagResult]:
        scores, idx, hits = fetched
        return select_wd14(
            scores, idx, hits,
            cats=self.cats, names=self.names, limits=limits, hard_cap=self.topk_cap,
        )

    def _select(
        self,
        probs: jnp.ndarray,
        thr_vec: np.ndarray,
        limits: dict[int, int | None],
        thresholds: ThresholdMap | None,
    ) -> list[TagResult]:
        fetched = jax.device_get(self._select_device(probs, thr_vec, limits))
        return self._select_host(fetched, limits, thresholds)

    # -- pipelined inference (dispatch/complete split) ---------------------
    # infer_batch_prepared syncs per batch: through the relay every batch
    # pays upload RTT + block_until_ready + device_get — measured ~1 s/batch
    # in the pipeline while the chained device forward is 50 ms/batch
    # (docs/benchmarks.md r4 E2E attribution). The split lets the tag stage
    # keep a bounded window of batches in flight so RTTs overlap compute.

    def dispatch_batch_prepared(
        self,
        batch: np.ndarray,
        *,
        thresholds: ThresholdMap | None = None,
        max_tags: MaxTagsMap | None = None,
    ) -> tuple:
        """Queue forward + device-side top-k for one batch WITHOUT syncing.

        Returns an opaque handle for :meth:`complete_batch_prepared`. Device
        errors surface at completion time (jax dispatch is async)."""
        thr_vec = (
            self._thr_vec_np
            if thresholds is None
            else build_threshold_vector(
                self.cats,
                {**self.thresholds, **{int(k): float(v) for k, v in thresholds.items()}},
                score_floor=self.score_floor,
            )
        )
        limits = resolve_limits(self.max_tags, max_tags)
        pending = self._select_device(self.forward_probs(batch), thr_vec, limits)
        return (pending, limits, thresholds)

    def complete_batch_prepared(self, handle: tuple) -> list[TagResult]:
        """Fetch + host-side selection for a dispatched batch (one sync)."""
        pending, limits, thresholds = handle
        fetched = jax.device_get(pending)
        return self._select_host(fetched, limits, thresholds)

    def infer_batches_prepared(
        self,
        batches: Sequence[np.ndarray],
        *,
        thresholds: ThresholdMap | None = None,
        max_tags: MaxTagsMap | None = None,
    ) -> list[list[TagResult]]:
        """Drain-style inference: dispatch every batch, sync ONCE.

        The serving throughput path: forwards and top-k selections for all
        batches are queued asynchronously, then a single device_get fetches
        every (small) result tensor in one host<->device round trip — per-
        batch sync latency does not accumulate (it dominates end-to-end
        time behind a high-latency relay).
        """
        thr_vec = (
            self._thr_vec_np
            if thresholds is None
            else build_threshold_vector(
                self.cats,
                {**self.thresholds, **{int(k): float(v) for k, v in thresholds.items()}},
                score_floor=self.score_floor,
            )
        )
        limits = resolve_limits(self.max_tags, max_tags)
        pending = [
            self._select_device(self.forward_probs(b), thr_vec, limits) for b in batches
        ]
        fetched = jax.device_get(pending)
        return [self._select_host(f, limits, thresholds) for f in fetched]

    def infer_batch(
        self,
        images: Sequence[np.ndarray],
        *,
        thresholds: ThresholdMap | None = None,
        max_tags: MaxTagsMap | None = None,
    ) -> list[TagResult]:
        batch = self.prepare_batch_from_rgb(images)
        return self.infer_batch_prepared(batch, thresholds=thresholds, max_tags=max_tags)


class WD14Tagger(JaxTagger):
    """WD14-class tagger: ~8k labels, white-letterbox BGR 0..255 input."""

    mode = "wd14"
    default_thresholds = WD14_DEFAULT_THRESHOLDS
    default_max_tags: dict[int, int | None] = {}


class PixaiTagger(JaxTagger):
    """PixAI-class tagger: ~13k labels, normalized input, per-category
    candidate extraction and character->copyright propagation."""

    mode = "pixai"
    default_thresholds = PIXAI_DEFAULT_THRESHOLDS
    default_max_tags = dict(PIXAI_DEFAULT_MAX_TAGS)

    def _select_device(self, probs: jnp.ndarray, thr_vec: np.ndarray, limits) -> tuple:
        present = sorted(set(int(c) for c in np.unique(self.cats)))
        caps = []
        for cat in present:
            limit = limits.get(cat)
            cap = self.topk_cap if limit is None else min(max(0, int(limit)), self.topk_cap)
            if cap > 0:
                caps.append((cat, cap))
        scores_d, idx_d = topk_hits_by_category(
            probs, self._thr_dev(thr_vec), self._cat_vec_dev, caps=tuple(caps)
        )
        # Full prob rows only needed when some candidate has ips links.
        if any(m.ips for m in self.labels):
            return (scores_d, idx_d, probs)
        return (scores_d, idx_d)

    def _select_host(self, fetched: tuple, limits, thresholds: ThresholdMap | None) -> list[TagResult]:
        scores, idx, *rest = fetched
        probs_np = rest[0] if rest else None
        eff_thresholds = dict(self.thresholds)
        if thresholds:
            eff_thresholds.update({int(k): float(v) for k, v in thresholds.items()})
        return select_pixai(
            scores, idx, probs_np,
            cats=self.cats, names=self.names, limits=limits, hard_cap=self.topk_cap,
            cat_thresholds=eff_thresholds, score_floor=self.score_floor,
            tag_meta=self._tag_meta, name_to_idx=self._name_to_idx,
        )


class DummyTagger:
    """Fixed-output tagger for tests/offline runs (reference tagger/dummy.py:13)."""

    mode = "dummy"

    def __init__(self, *, image_size: int = 448) -> None:
        self._size = image_size

    @property
    def input_size(self) -> int:
        return self._size

    def signature_fields(self) -> dict[str, str]:
        return {"name": "dummy", "arch": "none", "labels": "none", "ckpt": "none",
                "thr": "{}", "max": "{}", "floor": "0", "cap": "0"}

    def prepare_batch_from_rgb(self, images: Sequence[np.ndarray]) -> np.ndarray:
        return np.zeros((len(images), 1, 1, 3), dtype=np.uint8)

    def infer_batch_prepared(self, batch: np.ndarray, **_: Any) -> list[TagResult]:
        from kobato_eyes_tpu.models.base import TagCategory, TagPrediction

        return [
            TagResult(tags=[TagPrediction(name="1girl", score=0.9, category=TagCategory.GENERAL)])
            for _ in range(batch.shape[0])
        ]

    def infer_batch(self, images: Sequence[np.ndarray], **kw: Any) -> list[TagResult]:
        return self.infer_batch_prepared(self.prepare_batch_from_rgb(images), **kw)


# ---------------------------------------------------------------------------
# Checkpoint IO (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str | Path, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)


def load_checkpoint(path: str | Path) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)
