#!/usr/bin/env bash
# Fast local check: compile-sweep + full test suite on the CPU backend
# (counterpart of the reference's scripts/check.ps1).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m compileall -q kobato_eyes_tpu tools bench.py __graft_entry__.py

PYTHONPATH= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -m pytest tests/ -q "$@"
