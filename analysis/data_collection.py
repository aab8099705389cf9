"""Collect fine-tuning test metrics into experiment_results.csv.

Behavioural port of the reference analysis/data_collection.py:26-122: pulls
``test/*`` summaries per run, validates run names against the experiment grid,
and writes one row per (domain, strategy, scheme, seed). Source of truth here
is the local JSONL metric sink (``outputs/metrics/gnn-pretraining-finetune/
<run>.summary.json``) instead of the wandb API.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path
from typing import Dict, List, Optional

import pandas as pd

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnn_pretraining_tpu import config  # noqa: E402

RESULTS_DIR = Path(__file__).resolve().parent / "results"

_RUN_RE = re.compile(
    r"^(?P<domain>" + "|".join(config.FINETUNE_DOMAINS) + r")_"
    r"(?P<strategy>" + "|".join(config.FINETUNE_STRATEGIES) + r")_"
    r"(?P<scheme>" + "|".join(config.FINETUNE_SCHEMES) + r")_"
    r"(?P<seed>\d+)$")


def validate_run_name(run_name: str) -> Optional[Dict[str, str]]:
    """Parse and validate a run name (reference :26-57)."""
    m = _RUN_RE.match(run_name)
    if not m:
        return None
    d = m.groupdict()
    if int(d["seed"]) not in config.SEEDS:
        return None
    return d


def extract_all_finetune_results(metrics_dir: Optional[Path] = None
                                 ) -> pd.DataFrame:
    metrics_dir = Path(metrics_dir or
                       config.METRICS_DIR / config.FINETUNE_PROJECT_NAME)
    rows: List[Dict] = []
    for f in sorted(metrics_dir.glob("*.summary.json")):
        run_name = f.name[:-len(".summary.json")]
        parsed = validate_run_name(run_name)
        if parsed is None:
            print(f"  skipping malformed run name: {run_name}")
            continue
        summary = json.loads(f.read_text())
        row = {
            "domain": parsed["domain"],
            "strategy": parsed["strategy"],
            "scheme": parsed["scheme"],
            "seed": int(parsed["seed"]),
        }
        for k, v in summary.items():
            if k.startswith("test/"):
                row[k.replace("test/", "").replace("/", "_")] = v
        rows.append(row)
    return pd.DataFrame(rows)


KEY_COLS = ["domain", "strategy", "scheme", "seed"]


def merge_results(fresh: pd.DataFrame, existing: pd.DataFrame) -> pd.DataFrame:
    """Merge a freshly collected frame with a previously written results CSV.

    The metrics store (``outputs/``) is ephemeral (gitignored, lost on
    container resets) while ``experiment_results.csv`` is tracked, so a
    rebuild must never drop rows that only survive in the CSV. Fresh rows win
    per (domain, strategy, scheme, seed) cell; existing rows are kept for
    cells absent from the metrics store."""
    if existing.empty:
        return fresh
    if fresh.empty:
        return existing
    fresh_keys = set(map(tuple, fresh[KEY_COLS].itertuples(index=False)))
    keep = existing[~existing[KEY_COLS].apply(
        lambda r: tuple(r) in fresh_keys, axis=1)]
    return pd.concat([keep, fresh], ignore_index=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--metrics_dir", type=str, default=None)
    parser.add_argument("--out", type=str,
                        default=str(RESULTS_DIR / "experiment_results.csv"))
    parser.add_argument("--no_merge", action="store_true",
                        help="rebuild from the metrics store only, discarding "
                             "rows that exist solely in the output CSV")
    args = parser.parse_args()
    df = extract_all_finetune_results(args.metrics_dir)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    n_fresh = len(df)
    if not args.no_merge and out.exists():
        df = merge_results(df, pd.read_csv(out))
    df = df.sort_values(KEY_COLS).reset_index(drop=True)
    df.to_csv(out, index=False)
    print(f"Wrote {len(df)} rows ({n_fresh} fresh) -> {out}")


if __name__ == "__main__":
    main()
