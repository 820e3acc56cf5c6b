#!/usr/bin/env bash
# Hardware smoke suite on the attached chip (reference scripts/check-gpu.ps1).
# Run WITHOUT clearing PYTHONPATH so the real backend is used.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/tpu -m tpu --override-ini addopts='' -q "$@"
