"""L0 utilities: stdlib/PIL/numpy helpers with no jax dependency."""
