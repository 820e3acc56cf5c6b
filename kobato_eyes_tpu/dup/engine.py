"""TPU duplicate scanner: device candidate scan -> host DSU clustering.

Produces clusters identical to the reference ``DuplicateScanner``
(``src/dup/scanner.py:203-356``) for equal config, but generates candidates
with the vectorized all-pairs banded Hamming kernel (ops/hamming.py) instead
of Python bucket loops.
"""

from __future__ import annotations

import logging
import time
from typing import Iterable, Sequence

import numpy as np

from kobato_eyes_tpu.dup.types import (
    DuplicateCluster,
    DuplicateFileMeta,
    DuplicateScanConfig,
    NodeColumnCache,
    assemble_clusters_indexed,
)
from kobato_eyes_tpu.ops.hamming import BandedHammingScanner
from kobato_eyes_tpu.utils.bits import U64_MASK

logger = logging.getLogger(__name__)


class TpuDuplicateScanner:
    """Build duplicate clusters from perceptual hashes on device."""

    def __init__(
        self,
        config: DuplicateScanConfig | None = None,
        *,
        block: int = 2048,
        mesh=None,  # jax.sharding.Mesh: shard the candidate scan over chips
    ) -> None:
        self._config = config or DuplicateScanConfig()
        self._block = block
        self._scanner = BandedHammingScanner(
            band_bits=self._config.band_bits, band_count=self._config.band_count,
            mesh=mesh,
        )
        # per-file string sort keys survive across scans (service steady state)
        self._key_cache: dict[int, tuple[object, str, str, str, int]] = {}
        self._column_cache = NodeColumnCache()

    @property
    def config(self) -> DuplicateScanConfig:
        return self._config

    def build_clusters_sweep(
        self, files: Iterable[DuplicateFileMeta], thresholds: Sequence[int]
    ) -> dict[int, list[DuplicateCluster]]:
        """Clusters for SEVERAL Hamming thresholds from ONE device scan.

        The interactive workload (reference dup-tab slider, 0..10): candidate
        membership is threshold-independent (LSH buckets), so a single scan at
        max(thresholds) yields every edge set — each lower threshold is a
        host-side filter ``dist <= t`` plus re-assembly.  Parity with
        re-scanning at each t is exact.
        """
        thresholds = sorted(set(int(t) for t in thresholds))
        if not thresholds:
            return {}
        base_cfg = self._config
        scan_cfg = DuplicateScanConfig(
            hamming_threshold=max(thresholds),
            size_ratio=base_cfg.size_ratio,
            band_bits=base_cfg.band_bits,
            band_count=base_cfg.band_count,
            cosine_threshold=base_cfg.cosine_threshold,
            bucket_pair_cap=base_cfg.bucket_pair_cap,
        )
        ids, unique, ei, ej, dists = self._scan_edges(list(files), scan_cfg)
        out: dict[int, list[DuplicateCluster]] = {}
        for t in thresholds:
            keep = dists <= t
            out[t] = assemble_clusters_indexed(
                unique, ids, (ei[keep], ej[keep], dists[keep]),
                key_cache=self._key_cache, column_cache=self._column_cache,
            ) if len(unique) >= 2 else []
        return out

    def build_clusters(self, files: Iterable[DuplicateFileMeta]) -> list[DuplicateCluster]:
        cfg = self._config
        t0 = time.perf_counter()
        ids, unique, ei, ej, dists = self._scan_edges(list(files), cfg)
        if len(unique) < 2:
            return []

        from kobato_eyes_tpu.utils.metrics import metrics

        with metrics.timer("dup.assemble"):
            # index-space fast path: no id->meta dict, no id-sort node discovery
            clusters = assemble_clusters_indexed(
                unique, ids, (ei, ej, dists),
                key_cache=self._key_cache, column_cache=self._column_cache,
            )
        logger.info("dup: clusters=%d elapsed=%.3fs", len(clusters), time.perf_counter() - t0)
        return clusters

    def _scan_edges(
        self, files: list[DuplicateFileMeta], cfg: DuplicateScanConfig
    ) -> tuple[np.ndarray, list[DuplicateFileMeta], np.ndarray, np.ndarray, np.ndarray]:
        """Candidate scan -> (ids, unique_files, edge_i, edge_j, dists)."""
        candidates = [f for f in files if f.phash is not None]
        t0 = time.perf_counter()
        logger.info(
            "dup: candidates=%d band_bits=%d band_count=%d ham_th=%d size_ratio=%s cosine_th=%s",
            len(candidates), cfg.band_bits, cfg.band_count,
            cfg.hamming_threshold, cfg.size_ratio, cfg.cosine_threshold,
        )
        empty = np.empty(0, np.int64)
        if len(candidates) < 2:
            return empty, candidates, empty, empty, empty

        # Rows sharing a file_id would self-pair in index space; the reference
        # skips a.file_id == b.file_id pairs, so deduplicate rows up front.
        # Fast path: ids already unique (the common catalog case) — one numpy
        # check instead of a 70k-iteration set loop.
        ids_all = np.fromiter(
            (f.file_id for f in candidates), dtype=np.int64, count=len(candidates)
        )
        if len(np.unique(ids_all)) == len(ids_all):
            unique = candidates
            ids = ids_all
        else:
            seen: set[int] = set()
            unique = []
            for f in candidates:
                if f.file_id not in seen:
                    seen.add(f.file_id)
                    unique.append(f)
            ids = np.fromiter((f.file_id for f in unique), dtype=np.int64, count=len(unique))
        ph = np.fromiter(
            (f.phash & U64_MASK for f in unique), dtype=np.uint64, count=len(unique)
        )
        sizes = np.fromiter(
            (f.size or 0 for f in unique), dtype=np.float64, count=len(unique)
        )

        embeddings = None
        if cfg.cosine_threshold is not None and all(
            f.embedding is not None and len(f.embedding) > 0 for f in unique
        ):
            dims = {len(f.embedding) for f in unique}  # type: ignore[arg-type]
            if len(dims) == 1:
                embeddings = np.array([f.embedding for f in unique], dtype=np.float32)

        ei, ej, dists = self._scanner.scan(
            ph,
            hamming_threshold=cfg.hamming_threshold,
            sizes=sizes,
            size_ratio=cfg.size_ratio,
            bucket_pair_cap=cfg.bucket_pair_cap,
        )
        if embeddings is not None and cfg.cosine_threshold is not None and len(ei):
            # Cosine verification post-filters the (tiny) edge list — same
            # semantics as the reference's per-pair filter: zero-norm
            # embeddings pass (scanner _passes_cosine).
            norms = np.linalg.norm(embeddings, axis=1)
            valid = norms > 0
            unit = np.where(
                valid[:, None], embeddings / np.maximum(norms, 1e-30)[:, None], 0.0
            )
            cos = np.einsum("nd,nd->n", unit[ei], unit[ej])
            keep = (~(valid[ei] & valid[ej])) | (cos >= cfg.cosine_threshold)
            ei, ej, dists = ei[keep], ej[keep], dists[keep]
        logger.info(
            "dup: pairs scanned=%d -> edges=%d in %.3fs",
            len(unique) * (len(unique) - 1) // 2, len(ei), time.perf_counter() - t0,
        )
        return ids, unique, ei, ej, dists


def cluster_ids(clusters: Sequence[DuplicateCluster]) -> list[tuple[int, list[int]]]:
    """Canonical (keeper_id, ordered member ids) view for parity comparison."""
    return [(c.keeper_id, [e.file.file_id for e in c.files]) for c in clusters]
