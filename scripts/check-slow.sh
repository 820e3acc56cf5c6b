#!/usr/bin/env bash
# Opt-in long-running suite: 1M-hash scan, two-process multi-host cluster.
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -m pytest tests/ -q -m "slow" -o addopts="" "$@"
