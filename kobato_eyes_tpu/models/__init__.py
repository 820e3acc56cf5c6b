"""Model zoo: JAX/flax backbones and taggers (TPU compute path).

Replaces the reference's ONNX-Runtime black boxes (``src/tagger/wd14_onnx.py``,
``src/tagger/pixai_onnx.py``) with first-class jitted forward passes.
"""
