#!/bin/bash
# Real-data parity, turnkey (VERDICT r3 #6; see docs/DATA.md for what to
# download and where to place it). Verifies the raw files, records their
# SHA256 manifest, processes them (source=raw), runs the 12 b1 anchor cells
# at production fidelity, and writes the parity report against the
# reference's published CSV.
#
#   bash scripts/real_data_parity.sh [--skip_probes]
set -uo pipefail
cd "$(dirname "$0")/.."

python - <<'EOF'
import hashlib, json, sys
from pathlib import Path

RAW = Path("data/raw")
TU = {"MUTAG": 0, "PROTEINS": 1, "NCI1": 0, "ENZYMES": 1, "PTC_MR": 0}
PLANETOID = ["cora", "citeseer"]

def find(candidates):
    for c in candidates:
        if c.exists():
            return c
    return None

missing, manifest = [], {}
for name, has_attrs in TU.items():
    files = [f"{name}_A.txt", f"{name}_graph_indicator.txt",
             f"{name}_graph_labels.txt", f"{name}_node_labels.txt"]
    if has_attrs:
        files.append(f"{name}_node_attributes.txt")
    for f in files:
        p = find([RAW / f, RAW / name / "raw" / f, RAW / name / f])
        if p is None:
            missing.append(f)
        else:
            manifest[str(p)] = {
                "sha256": hashlib.sha256(p.read_bytes()).hexdigest(),
                "bytes": p.stat().st_size}
for lname in PLANETOID:
    name = lname.capitalize() if lname != "citeseer" else "CiteSeer"
    for suf in ("x", "tx", "allx", "y", "ty", "ally", "graph", "test.index"):
        f = f"ind.{lname}.{suf}"
        p = find([RAW / f, RAW / name / "raw" / f, RAW / name / f])
        if p is None:
            missing.append(f)
        else:
            manifest[str(p)] = {
                "sha256": hashlib.sha256(p.read_bytes()).hexdigest(),
                "bytes": p.stat().st_size}

if missing:
    print("real_data_parity: missing raw files (see docs/DATA.md):")
    for f in missing:
        print("  ", f)
    sys.exit(1)

out = Path("analysis/results/real_data_manifest.json")
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps(manifest, indent=2, sort_keys=True) + "\n")
print(f"manifest: {len(manifest)} files -> {out}")
EOF

echo "=== data setup (raw) $(date -u +%FT%TZ) ==="
python -m gnn_pretraining_tpu.data.setup

if [ "${1:-}" = "--skip_probes" ]; then
    echo "skipping b1 probes; run scripts/production_sweep.sh for the grid"
    exit 0
fi

echo "=== b1 anchor probes (12 cells, production fidelity) ==="
for domain in ENZYMES PTC_MR Cora_NC CiteSeer_NC Cora_LP CiteSeer_LP; do
    for strategy in full_finetune linear_probe; do
        python run_finetune.py --domain_name "$domain" \
            --finetune_strategy "$strategy" --pretrained_scheme b1 \
            --seed 42 --no_wandb
    done
done

echo "=== parity report ==="
python analysis/data_collection.py
python scripts/parity_report.py
echo "=== done: analysis/results/parity_vs_reference.md now reflects real data ==="
