#!/usr/bin/env bash
# End-of-round chip validation + benchmark session (run AFTER the sweep
# drains — it reclaims the exclusive TPU from a recorded sweep PID).
#
#   nohup bash scripts/chip_session.sh > /tmp/chip_session.log 2>&1 &
#
# Order matters: correctness first (chip_check exits non-zero on any kernel
# parity failure), then the tuning/crossover scans, then bench.py last so
# its JSON lines are the freshest numbers.
set -u
cd "$(dirname "$0")/.."

echo "=== chip_check ==="
python scripts/chip_check.py
rc=$?
echo "chip_check rc=$rc"
if [ "$rc" -ne 0 ]; then
    echo "chip_check failed — aborting before tuning/bench (fix kernels first)"
    exit "$rc"
fi

echo "=== ntxent size scan (sets FUSED_NTXENT_MIN_ROWS) ==="
python - <<'EOF'
import json
import jax, jax.numpy as jnp
import bench
from gnn_pretraining_tpu.utils.runtime import setup_jax
setup_jax()
for rows in (1024, 2048, 4096, 8192):
    try:
        print(json.dumps(bench._ntxent_bench(jax, jnp, rows, 128)), flush=True)
    except Exception as e:
        print(json.dumps({"bench": f"ntxent n={rows}", "error": str(e)[:200]}),
              flush=True)
EOF

echo "=== tune_spmm ==="
python scripts/tune_spmm.py

echo "=== crossover scan (banded, CSR regime) ==="
python scripts/crossover_scan.py --sizes 4096 8192 16384 32768 --band 512 --degree 8

echo "=== bench ==="
python bench.py
echo "=== chip session done ==="
