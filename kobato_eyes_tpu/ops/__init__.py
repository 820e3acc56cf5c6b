"""Device kernels (Pallas + jnp) for the index-and-query engine.

Every kernel here has a numpy reference implementation used for parity tests
on the CPU backend; TPU-specific Pallas paths are selected at runtime.
"""
