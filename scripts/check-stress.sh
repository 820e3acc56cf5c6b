#!/usr/bin/env bash
# Opt-in concurrency/stress suite (reference scripts/check-db-stress.ps1).
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -m pytest tests/ -q -m "stress" -o addopts="" "$@"
