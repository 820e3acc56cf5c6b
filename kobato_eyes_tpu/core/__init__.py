"""Core runtime: config, scanner, query compiler, pipeline, epochs, jobs."""
