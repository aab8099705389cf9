#!/usr/bin/env bash
# Build the native extensions in-place (repo root on sys.path picks them up).
set -euo pipefail
cd "$(dirname "$0")/.."
python native/setup.py build_ext --inplace --build-lib . --build-temp build/native
echo "native extensions built:"
ls -la _gnn_batcher*.so 2>/dev/null || true
