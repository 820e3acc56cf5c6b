"""ANN vector index: CLIP-style embeddings + exact / IVF-Flat / HNSW search.

Activates the reference's dormant ``src/index/`` stub (3 LoC;
``pyproject.toml:50-52`` declared hnswlib + open_clip but never used them).
TPU-first design: embeddings come from a jitted ViT pass, exact and IVF-Flat
search are MXU matmuls, and HNSW keeps its graph on host (C++ runtime) while
batching distance evaluations on device.
"""

from kobato_eyes_tpu.index.flat import FlatIndex
from kobato_eyes_tpu.index.ivf import IvfFlatIndex, kmeans

__all__ = ["FlatIndex", "IvfFlatIndex", "kmeans"]
