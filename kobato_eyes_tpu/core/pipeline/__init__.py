"""Index pipeline: Scan -> Tag -> Write -> Epoch swap."""

from kobato_eyes_tpu.core.pipeline.orchestrator import IndexPipeline, IndexStats, run_index_once

__all__ = ["IndexPipeline", "IndexStats", "run_index_once"]
