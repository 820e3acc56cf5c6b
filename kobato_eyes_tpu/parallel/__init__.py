"""Multi-chip execution: device meshes, sharding rules, sharded steps.

The reference is a single-node threaded app (SURVEY.md §2.3); its TPU-native
scaling story is data-parallel sharding of batches and index shards over ICI
via ``jax.sharding`` + ``jit``, with optional tensor parallelism for large
tagger backbones.  XLA inserts the collectives.
"""

from kobato_eyes_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

__all__ = ["make_mesh", "shard_batch", "shard_params"]
