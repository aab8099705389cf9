"""Reduced end-to-end sweep: pretrain a few schemes, fine-tune the full domain
grid against them, and build the analysis artifacts.

A scaled-down version of the reference's 24+324-run production sweep
(vm_execution_scripts/EXECUTION_GUIDE.md) that exercises every moving part —
pretraining, transfer, all three fine-tune task types, both strategies,
metrics collection, tables and heatmaps — in under an hour on one chip.

Usage: python scripts/mini_sweep.py [--schemes b2 b3] [--seeds 42]
       [--pretrain_epochs 5] [--finetune_epochs 10]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnn_pretraining_tpu import config  # noqa: E402
from gnn_pretraining_tpu.finetune.finetune import finetune  # noqa: E402
from gnn_pretraining_tpu.pretrain.pretrain import pretrain  # noqa: E402
from gnn_pretraining_tpu.utils.runtime import setup_jax  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--schemes", nargs="+", default=["b2", "b3"])
    p.add_argument("--seeds", nargs="+", type=int, default=[42])
    p.add_argument("--pretrain_epochs", type=int, default=5)
    p.add_argument("--finetune_epochs", type=int, default=10)
    p.add_argument("--aggregation", type=str, default="pallas")
    p.add_argument("--domains", nargs="+",
                   default=list(config.FINETUNE_DOMAINS))
    p.add_argument("--skip_pretrain", action="store_true",
                   help="reuse existing pretrain checkpoints")
    p.add_argument("--out_root", type=str, default="outputs/mini_sweep",
                   help="artifact store for this sweep; keeps reduced-epoch "
                        "runs out of the production outputs/ tree")
    args = p.parse_args()

    setup_jax()
    t0 = time.time()

    for scheme in ([] if args.skip_pretrain else args.schemes):
        for seed in args.seeds:
            cfg = config.PretrainConfig(exp_name=scheme, seed=seed)
            t = time.time()
            res = pretrain(cfg, aggregation=args.aggregation,
                           epochs=args.pretrain_epochs, use_wandb=False,
                           out_root=args.out_root)
            print(f"[pretrain] {cfg.run_name}: best={res['best_val_total']:.4f}"
                  f" ({time.time()-t:.0f}s)", flush=True)

    ft_schemes = ["b1"] + args.schemes
    for domain in args.domains:
        for strategy in config.FINETUNE_STRATEGIES:
            for scheme in ft_schemes:
                for seed in args.seeds:
                    cfg = config.FinetuneConfig(domain_name=domain,
                                                finetune_strategy=strategy,
                                                pretrained_scheme=scheme,
                                                seed=seed)
                    t = time.time()
                    res = finetune(cfg, aggregation=args.aggregation,
                                   epochs=args.finetune_epochs,
                                   use_wandb=False, out_root=args.out_root)
                    key = ("test/auc" if cfg.task_type == "link_prediction"
                           else "test/accuracy")
                    print(f"[finetune] {cfg.run_name}: {key.split('/')[1]}="
                          f"{res[key]:.4f} ({time.time()-t:.0f}s)", flush=True)

    subprocess.run(
        [sys.executable, "analysis/data_collection.py", "--metrics_dir",
         str(Path(args.out_root) / "metrics" / config.FINETUNE_PROJECT_NAME)],
        check=True)
    subprocess.run([sys.executable, "analysis/data_analysis.py"], check=True)
    print(f"mini sweep done in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
