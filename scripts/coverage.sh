#!/usr/bin/env bash
# Coverage-gated test run (reference: pytest-cov fail_under=80,
# pyproject.toml:92-96). pytest-cov is not in this image, so the gate is
# tools/coverage_gate.py (sys.monitoring line coverage). Measured 89.1% at
# round 2; the gate is set at the reference's 80.
set -euo pipefail
cd "$(dirname "$0")/.."

PYTHONPATH= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python tools/coverage_gate.py --fail-under 80 -- tests/ -q "$@"
