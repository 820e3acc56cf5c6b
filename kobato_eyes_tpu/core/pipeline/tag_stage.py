"""Tag stage: prefetch-loaded batches through the device tagger.

Parity behaviors from the reference (``core/pipeline/stages/tag_stage.py``):

* records sorted by (parent, size) for IO locality (done in the loader);
* **halving retry** — a failed batch is recursively split in two so one
  poison image costs log2(B) retries, not the batch (:200-214);
* duplicate tag names within one result keep the max score (:283-292);
* emits WriteItems to the async writer and flips record state.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol, Sequence

import numpy as np

from kobato_eyes_tpu.core.pipeline.contracts import FileRecord, WriteItem
from kobato_eyes_tpu.core.pipeline.loaders import PreparedBatch, PrefetchLoader
from kobato_eyes_tpu.core.progress import IndexPhase, IndexProgress, ProgressEmitter
from kobato_eyes_tpu.models.base import ITagger, TagResult

logger = logging.getLogger(__name__)


class WriteSink(Protocol):
    def put(self, item: WriteItem, *, timeout: float | None = None) -> None: ...


@dataclass
class TagStageResult:
    tagged: int = 0
    failed: int = 0
    skipped: int = 0
    infer_seconds: float = 0.0
    batches: int = 0
    failed_ids: list[int] = field(default_factory=list)
    embedded: int = 0  # ANN vectors fused into tag dispatches
    signed: int = 0  # pHash/dHash signatures fused into tag dispatches


class TagStage:
    def __init__(
        self,
        tagger: ITagger,
        *,
        tagger_sig: str,
        batch_size: int = 32,
        prefetch_depth: int = 4,
        io_workers: int = 8,
        input_cache_dir: str | None = None,
        is_cancelled: Callable[[], bool] | None = None,
        pipeline_depth: int = 3,
        embedder=None,  # index.embedder.ImageEmbedder in derived-prep mode
        embed_need: set[int] | None = None,
        sig_need: set[int] | None = None,
    ) -> None:
        self._tagger = tagger
        self._tagger_sig = tagger_sig
        self._batch_size = batch_size
        self._prefetch_depth = prefetch_depth
        self._io_workers = io_workers
        self._input_cache_dir = input_cache_dir
        self._is_cancelled = is_cancelled or (lambda: False)
        self._pipeline_depth = max(1, int(pipeline_depth))
        self._embedder = embedder
        self._embed_need = embed_need or set()
        # Fused signatures (tag+sig): files whose pHash/dHash should be
        # computed from the tag stage's decode — the loader produces the
        # grayscale hash tiles, this stage chains the hash kernels onto the
        # batch dispatch, and the words ride the WriteItems. Any failure is
        # a downgrade: the standalone compute_signatures lane (ket dup)
        # covers whatever has no signature row.
        self._sig_need = sig_need or set()

    def run(
        self,
        records: Sequence[FileRecord],
        sink: WriteSink,
        progress: ProgressEmitter,
    ) -> TagStageResult:
        todo = [r for r in records if r.needs_tagging]
        result = TagStageResult(skipped=len(records) - len(todo))
        if not todo:
            return result
        progress.phase(IndexPhase.TAG, 0, len(todo))
        from kobato_eyes_tpu.core.pipeline.loaders import PreparedInputCache

        cache = (
            PreparedInputCache(
                self._input_cache_dir,
                namespace=f"{getattr(self._tagger, 'mode', 'tagger')}:{self._tagger.input_size}",
            )
            if self._input_cache_dir
            else None
        )
        loader = PrefetchLoader(
            todo,
            prepare=self._tagger.prepare_batch_from_rgb,
            batch_size=self._batch_size,
            prefetch_depth=self._prefetch_depth,
            io_workers=self._io_workers,
            cache=cache,
            is_cancelled=self._is_cancelled,
            sig_need=self._sig_need,
        )
        # Bounded in-flight pipeline: through the relay, a per-batch sync
        # costs upload RTT + block + fetch (~1 s/batch measured vs 50 ms of
        # device work); dispatching up to pipeline_depth batches before the
        # oldest is fetched overlaps those round trips with compute. Taggers
        # without the dispatch/complete split (dummy, test fakes) take the
        # per-batch path unchanged. Failure policy preserved: a batch whose
        # dispatch OR completion raises re-runs through the synchronous
        # halving retry.
        can_pipeline = (
            self._pipeline_depth > 1
            and hasattr(self._tagger, "dispatch_batch_prepared")
            and hasattr(self._tagger, "complete_batch_prepared")
        )
        # Fused embedding: when the embedder's derived prep IS the tagger's
        # prepared geometry, device_put the batch once and chain BOTH the tag
        # forward and the embedding forward on the same device pixels — the
        # embed stage's second decode pass and second upload disappear
        # (cold-wall attribution, docs/benchmarks.md r5). Failure policy: any
        # fused-embed error downgrades that batch to tags-only; the residual
        # embed stage re-covers whatever has no stored vector.
        spec = getattr(self._tagger, "spec", None)
        can_fuse = (
            can_pipeline
            and self._embedder is not None
            and bool(self._embed_need)
            and spec is not None
            and getattr(self._embedder, "accepts_prepared", lambda *_: False)(
                self._tagger.input_size, spec.mode
            )
        )
        from collections import deque

        inflight: deque = deque()
        done = 0
        for batch in loader:
            if self._is_cancelled():
                break
            if not can_pipeline:
                self._infer_with_retry(batch, sink, result)
                done += len(batch.records)
                progress.emit(IndexProgress(IndexPhase.TAG, done, len(todo)))
                continue
            t0 = time.perf_counter()
            pixels = batch.pixels
            emb_pending = None
            if can_fuse and any(r.file_id in self._embed_need for r in batch.records):
                try:
                    import jax

                    pixels = jax.device_put(batch.pixels)
                    emb_pending = self._embedder.dispatch_batch_prepared(pixels)
                except Exception:  # noqa: BLE001
                    logger.warning(
                        "fused embed dispatch failed; batch downgraded to tags-only",
                        exc_info=True,
                    )
                    emb_pending = None
            try:
                handle = self._tagger.dispatch_batch_prepared(pixels)
            except Exception:  # noqa: BLE001 — tracing/shape errors
                logger.warning("dispatch failed; falling back to sync retry")
                self._infer_with_retry(batch, sink, result)
                done += len(batch.records)
                progress.emit(IndexProgress(IndexPhase.TAG, done, len(todo)))
                continue
            result.infer_seconds += time.perf_counter() - t0
            sig_pending = self._sig_dispatch(batch)
            inflight.append((batch, handle, emb_pending, sig_pending))
            if len(inflight) >= self._pipeline_depth:
                done += self._complete_pipelined(*inflight.popleft(), sink=sink, result=result)
                progress.emit(IndexProgress(IndexPhase.TAG, done, len(todo)))
        while inflight and not self._is_cancelled():
            done += self._complete_pipelined(*inflight.popleft(), sink=sink, result=result)
            progress.emit(IndexProgress(IndexPhase.TAG, done, len(todo)))
        # decode failures discovered by the loader
        for r in todo:
            if r.failed and r.file_id not in result.failed_ids:
                result.failed += 1
                result.failed_ids.append(r.file_id)
        logger.info(
            "tag: %d tagged, %d failed, %d skipped, infer=%.2fs over %d batches",
            result.tagged, result.failed, result.skipped,
            result.infer_seconds, result.batches,
        )
        return result

    def _sig_dispatch(self, batch: PreparedBatch):
        """Queue the pHash/dHash kernels for the batch's hash tiles (fused
        tag+sig) WITHOUT syncing; returns (indices, pending) or None."""
        idxs = [i for i, g in enumerate(batch.grays) if g is not None]
        if not idxs:
            return None
        try:
            from kobato_eyes_tpu.sig.signatures import dispatch_hash_batch

            g32 = np.stack([batch.grays[i][0] for i in idxs])
            g98 = np.stack([batch.grays[i][1] for i in idxs])
            return idxs, dispatch_hash_batch(g32, g98)
        except Exception:  # noqa: BLE001 — standalone signature lane covers
            logger.warning("fused sig dispatch failed; batch downgraded", exc_info=True)
            return None

    def _sig_complete(self, pending) -> dict[int, tuple[int, int]]:
        """Fetch a dispatched hash pair -> {batch index: (phash, dhash)}."""
        if pending is None:
            return {}
        idxs, handles = pending
        try:
            from kobato_eyes_tpu.sig.signatures import complete_hash_batch

            ph, dh = complete_hash_batch(handles)
            return {i: (p, d) for i, p, d in zip(idxs, ph, dh)}
        except Exception:  # noqa: BLE001 — standalone signature lane covers
            logger.warning("fused sig completion failed; batch downgraded", exc_info=True)
            return {}

    def _complete_pipelined(
        self, batch: PreparedBatch, handle: tuple, emb_pending=None,
        sig_pending=None, *,
        sink: WriteSink, result: TagStageResult,
    ) -> int:
        """Fetch one in-flight batch; device failures re-run it through the
        synchronous halving retry (same terminal behavior as the sync path)."""
        try:
            t0 = time.perf_counter()
            outputs = self._tagger.complete_batch_prepared(handle)
            result.infer_seconds += time.perf_counter() - t0
            result.batches += 1
        except Exception:  # noqa: BLE001
            logger.warning(
                "pipelined batch of %d failed at completion; sync retry",
                len(batch.records),
            )
            self._infer_with_retry(batch, sink, result)
            return len(batch.records)
        vecs = model_key = None
        if emb_pending is not None:
            try:
                t0 = time.perf_counter()
                vecs = self._embedder.complete_batch_prepared(emb_pending)
                result.infer_seconds += time.perf_counter() - t0
                model_key = getattr(self._embedder, "model_key", None)
            except Exception:  # noqa: BLE001
                logger.warning(
                    "fused embed completion failed; batch downgraded to tags-only",
                    exc_info=True,
                )
                vecs = None
        sigs = self._sig_complete(sig_pending)
        now = time.time()
        for i, (record, output) in enumerate(zip(batch.records, outputs)):
            emb = None
            if vecs is not None and record.file_id in self._embed_need:
                emb = np.asarray(vecs[i], np.float32)
                record.embedded = True
                result.embedded += 1
            sig = sigs.get(i)
            if sig is not None:
                record.signed = True
                result.signed += 1
            sink.put(self._to_write_item(
                record, output, now, embedding=emb, embed_model=model_key, sig=sig,
            ))
            record.tagged = True
            result.tagged += 1
        return len(batch.records)

    def _infer_with_retry(
        self, batch: PreparedBatch, sink: WriteSink, result: TagStageResult
    ) -> None:
        """Run one prepared batch; on failure split in half recursively
        (reference halving retry)."""
        try:
            t0 = time.perf_counter()
            outputs = self._tagger.infer_batch_prepared(batch.pixels)
            result.infer_seconds += time.perf_counter() - t0
            result.batches += 1
        except Exception:  # noqa: BLE001
            n = len(batch.records)
            if n <= 1:
                logger.exception("inference failed for %s; skipping", batch.records[0].path)
                batch.records[0].failed = True
                result.failed += 1
                result.failed_ids.append(batch.records[0].file_id)
                return
            mid = n // 2
            logger.warning("batch of %d failed; retrying as %d + %d", n, mid, n - mid)
            for lo, hi in ((0, mid), (mid, n)):
                sub = PreparedBatch(
                    records=batch.records[lo:hi],
                    pixels=batch.pixels[lo:hi],
                    sizes=batch.sizes[lo:hi],
                    grays=batch.grays[lo:hi] if batch.grays else [],
                )
                self._infer_with_retry(sub, sink, result)
            return

        # fused sigs on the sync path: dispatch + complete back-to-back
        sigs = self._sig_complete(self._sig_dispatch(batch))
        now = time.time()
        for i, (record, output) in enumerate(zip(batch.records, outputs)):
            sig = sigs.get(i)
            if sig is not None:
                record.signed = True
                result.signed += 1
            sink.put(self._to_write_item(record, output, now, sig=sig))
            record.tagged = True
            result.tagged += 1

    def _to_write_item(
        self, record: FileRecord, output: TagResult, now: float,
        embedding: np.ndarray | None = None, embed_model: str | None = None,
        sig: tuple[int, int] | None = None,
    ) -> WriteItem:
        # Duplicate names keep the max score (reference tag_stage.py:283-292).
        merged: dict[str, tuple[float, int]] = {}
        for t in output.tags:
            prev = merged.get(t.name)
            if prev is None or t.score > prev[0]:
                merged[t.name] = (float(t.score), int(t.category))
        return WriteItem(
            file_id=record.file_id,
            tags=[(name, score, cat) for name, (score, cat) in merged.items()],
            width=record.width,
            height=record.height,
            tagger_sig=self._tagger_sig,
            tagged_at=now,
            embedding=embedding,
            embed_model=embed_model if embedding is not None else None,
            phash=sig[0] if sig is not None else None,
            dhash=sig[1] if sig is not None else None,
        )


def batch_pixels_view(pixels: np.ndarray, lo: int, hi: int) -> np.ndarray:
    return pixels[lo:hi]
