"""Regenerate the LP sweep cells lost to an outputs/ reset.

The production store (``outputs/``) is gitignored and does not survive
container resets; only ``analysis/results/experiment_results.csv`` is
tracked. After a reset the missing cells are all CiteSeer_LP plus
Cora_LP linear_probe b2-s5, and every non-b1 cell needs its pretrain
checkpoint back. This driver minimizes time-to-row:

1. the six CiteSeer_LP b1 cells (from-scratch, no checkpoint needed);
2. per (scheme, seed): the 50-epoch pretrain cell, then immediately its
   three dependent fine-tune cells (CiteSeer_LP full+linear, Cora_LP
   linear) while the checkpoint exists.

After every chunk the analysis collector runs in merge mode so each new
row lands in the tracked CSV even if the session ends mid-sweep.

Usage: nohup python scripts/resume_lp_sweep.py > /tmp/resume_sweep.log 2>&1 &
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnn_pretraining_tpu import config  # noqa: E402
from gnn_pretraining_tpu.utils.logging import (  # noqa: E402
    record_pretrain_timing,
)
from gnn_pretraining_tpu.utils.runtime import (  # noqa: E402
    setup_jax,
    write_pidfile,
)


RESULTS_CSV = (config.REPO_ROOT / "analysis" / "results"
               / "experiment_results.csv")


def collect() -> None:
    subprocess.run([sys.executable, "analysis/data_collection.py"],
                   cwd=config.REPO_ROOT, check=False)


def cells_in_csv() -> set:
    """Cells already recorded in the tracked results CSV. Completion markers
    (outputs/metrics) die with the container; the CSV is the cross-reset
    source of truth, so a cell present there never re-runs."""
    if not RESULTS_CSV.exists():
        return set()
    import csv

    with open(RESULTS_CSV) as f:
        return {(r["domain"], r["strategy"], r["scheme"], int(r["seed"]))
                for r in csv.DictReader(f)}


def plan(done: set):
    """Work plan given the cells already recorded: the b1 grid (no pretrain
    dependency) and the per-(scheme, seed) chunks of dependent fine-tune
    cells, skipping chunks whose dependents are all recorded."""
    b1_grid = [c for c in
               [("CiteSeer_LP", st, "b1", seed)
                for st in config.FINETUNE_STRATEGIES for seed in config.SEEDS]
               if c not in done]
    chunks = []
    for scheme in config.ALL_SCHEMES:
        for seed in config.SEEDS:
            dep_grid = [c for c in
                        [("CiteSeer_LP", "full_finetune", scheme, seed),
                         ("CiteSeer_LP", "linear_probe", scheme, seed),
                         ("Cora_LP", "linear_probe", scheme, seed)]
                        if c not in done]
            if dep_grid:
                chunks.append((scheme, seed, dep_grid))
    return b1_grid, chunks


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--aggregation", type=str, default="pallas")
    args_ns = parser.parse_args()

    write_pidfile()  # lets bench/chip_check reclaim the exclusive chip
    setup_jax()
    import jax

    assert jax.default_backend() == "tpu", "TPU relay unreachable"

    if not (config.PROCESSED_DIR / "ENZYMES.npz").exists():
        from gnn_pretraining_tpu.data.setup import main as setup_data

        setup_data()

    class Args:
        resume = True
        aggregation = args_ns.aggregation
        no_wandb = True
        epochs = None
        shard_index = None
        num_shards = 0
        out_root = None

    from run_finetune import run_grid
    from run_pretrain import cell_completed as pre_done
    from gnn_pretraining_tpu.pretrain.pretrain import pretrain

    ft_args = Args()

    b1_grid, chunks = plan(cells_in_csv())

    # Phase 0: b1 cells — no pretrained checkpoint involved.
    if b1_grid:
        run_grid(b1_grid, ft_args)
        collect()

    # Phase 1: per (scheme, seed) chunk — pretrain, then dependents.
    class PreArgs:
        resume = True
        aggregation = args_ns.aggregation
        epochs = config.PRETRAIN_EPOCHS
        out_root = None

    for scheme, seed, dep_grid in chunks:
        pcfg = config.PretrainConfig(exp_name=scheme, seed=seed)
        if not pre_done(pcfg, PreArgs()):
            print(f"=== pretrain {pcfg.run_name} start ===", flush=True)
            t0 = time.time()
            try:
                res = pretrain(pcfg, aggregation=args_ns.aggregation,
                               epochs=config.PRETRAIN_EPOCHS, use_wandb=False,
                               resume=True)
            except Exception:
                import traceback

                traceback.print_exc()
                print(f"=== pretrain {pcfg.run_name} FAILED ===", flush=True)
                continue
            # cell-timing line in the sweep_report.py format
            print(f"[1/1] {pcfg.run_name}: "
                  f"best_val={res['best_val_total']:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            record_pretrain_timing(pcfg.run_name, time.time() - t0)
        run_grid(dep_grid, ft_args)
        collect()
    print("=== resume_lp_sweep done ===", flush=True)


if __name__ == "__main__":
    main()
