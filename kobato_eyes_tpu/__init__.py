"""kobato-eyes-tpu: a TPU-native image index-and-query engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
srndpty/kobato-eyes reference application (see SURVEY.md): perceptual-hash
near-duplicate detection, Danbooru-style neural tagging, a tag query language
with exact AND/OR/NOT/category/score semantics, and an ANN vector-search path.

Layering (low to high; enforced by tests/test_import_graph.py):

    utils    -> stdlib/PIL/numpy helpers, no jax
    parallel -> device mesh / sharding / collectives (jax only)
    ops      -> device kernels (Pallas + jnp): DCT hash, Hamming, SSIM, ...
    db       -> host durability catalog (SQLite)
    models   -> neural nets (flax): ViT tagger, CLIP encoder
    dup      -> duplicate-detection engine built on ops
    index    -> ANN engine (IVF-Flat, HNSW via native C++)
    core     -> config, scanner, query compiler, pipeline, epochs, jobs
    services -> async write-back services
"""

__version__ = "0.1.0"
