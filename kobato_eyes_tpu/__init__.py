"""kobato-eyes-tpu: a TPU-native image index-and-query engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
srndpty/kobato-eyes reference application (see SURVEY.md): perceptual-hash
near-duplicate detection, Danbooru-style neural tagging, a tag query language
with exact AND/OR/NOT/category/score semantics, and an ANN vector-search path.

Layering (low to high; enforced by tests/test_import_graph.py):

    utils    -> stdlib/PIL/numpy helpers, no jax
    native   -> C++ host runtime built on demand (HNSW graph)
    ops      -> device kernels (Pallas + jnp): DCT hash, Hamming, SSIM, ...
    parallel -> device mesh / sharding / sharded kernels
    sig      -> host decode -> batched device signature pipeline
    db       -> host durability catalog (SQLite)
    models   -> neural nets (flax): ViT/SwinV2 taggers, CLIP encoder, training
    query    -> tag query language: AST, SQL backend, device posting lists
    dup      -> duplicate-detection engine built on ops
    index    -> ANN engine (flat/IVF-Flat on device, HNSW native)
    services -> async write-back services
    core     -> config, scanner, pipeline stages, epochs, jobs, watcher
    cli      -> the 'ket' command surface
"""

__version__ = "0.1.0"
