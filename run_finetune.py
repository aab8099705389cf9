"""Fine-tuning sweep driver.

CLI surface mirrors the reference's run_finetune.py (``--sweep`` |
``--domain_sweep D`` | single run). The 324-cell grid
(6 domains × 2 strategies × 9 schemes × 3 seeds) runs in-process with
per-cell completion markers; ``--resume`` skips completed cells.
"""

from __future__ import annotations

import argparse
import time
import traceback
from typing import List, Tuple

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.utils.runtime import (
    maybe_clear_caches,
    maybe_init_distributed,
    setup_jax,
    write_pidfile,
)
from gnn_pretraining_tpu.finetune.finetune import finetune


from run_pretrain import (  # noqa: E402 — shared CLI helpers
    add_sweep_args,
    common_child_flags,
    metrics_root,
    run_isolated,
    shard_grid,
    slice_grid,
)


def _parallel_kwargs(args, cfg) -> dict:
    """Map the driver's --partition/--dp surface onto finetune()'s modes.

    --partition engages the sharded full-graph paths for node/link tasks
    (node = halo-exchange row sharding, finetune/node_parallel.py; edge =
    edge-list sharding with psum'd partials, finetune/edge_parallel.py);
    --dp auto engages the graph-classification data-parallel path. Modes
    that do not apply to a cell's task type fall back to the single-device
    path, so one flag works across a mixed-domain sweep."""
    kwargs = {}
    partition = getattr(args, "partition", "none")
    if partition != "none" and cfg.task_type in ("node_classification",
                                                 "link_prediction"):
        kwargs["node_parallel" if partition == "node"
               else "edge_parallel"] = True
    if getattr(args, "dp", "off") == "auto" \
            and cfg.task_type == "graph_classification":
        kwargs["data_parallel"] = True
    return kwargs


def cell_completed(cfg, args) -> bool:
    """Fidelity-aware completion check (see run_pretrain.cell_completed)."""
    from gnn_pretraining_tpu.utils.fidelity import (
        cell_completed as _check,
        fidelity_block,
    )

    path = (metrics_root(args) / config.FINETUNE_PROJECT_NAME
            / f"{cfg.run_name}.summary.json")
    expected = fidelity_block(args.epochs or cfg.epochs, cfg.seed,
                              args.aggregation,
                              getattr(args, "processed_dir", None),
                              (cfg.domain_name,))
    return _check(path, expected)


def pretrain_ready(scheme: str, seed: int, args) -> bool:
    """Guard: a fine-tune cell must not consume an incomplete pretrain
    checkpoint. ``model_<scheme>_<seed>.msgpack`` is written at every new
    best-val epoch, so the file exists even when the pretrain run crashed
    mid-way (observed: s5_126 OOM-killed at epoch 37/50 left a checkpoint the
    sweep silently fine-tuned from). Accept only checkpoints whose pretrain
    summary carries a matching completed fidelity block."""
    if scheme == "b1":  # from-scratch — no pretrained checkpoint involved
        return True
    from gnn_pretraining_tpu.utils.fidelity import (
        cell_completed as _check,
        fidelity_block,
    )

    pcfg = config.PretrainConfig(exp_name=scheme, seed=seed)
    path = (metrics_root(args) / config.PRETRAIN_PROJECT_NAME
            / f"{pcfg.run_name}.summary.json")
    expected = fidelity_block(config.PRETRAIN_EPOCHS, seed, args.aggregation,
                              getattr(args, "processed_dir", None),
                              pcfg.pretrain_domains)
    return _check(path, expected)


def full_grid() -> List[Tuple[str, str, str, int]]:
    return [(d, st, sc, seed)
            for d in config.FINETUNE_DOMAINS
            for st in config.FINETUNE_STRATEGIES
            for sc in config.FINETUNE_SCHEMES
            for seed in config.SEEDS]


def run_grid(grid, args):
    grid = slice_grid(shard_grid(grid, args), args)
    if getattr(args, "isolate", 0):
        flags = common_child_flags(args)
        if args.domain_sweep:
            # Children must enumerate the SAME (filtered) grid as the parent
            # or the --grid_start/--grid_count slices point at different
            # cells (the parent's grid here is domain-filtered).
            flags.remove("--sweep")
            flags += ["--domain_sweep", args.domain_sweep]
        if args.processed_dir:
            flags += ["--processed_dir", str(args.processed_dir)]
        def incomplete(cell):
            cfg = config.FinetuneConfig(domain_name=cell[0],
                                        finetune_strategy=cell[1],
                                        pretrained_scheme=cell[2],
                                        seed=cell[3])
            return None if cell_completed(cfg, args) else cfg.run_name
        return run_isolated("run_finetune.py", grid, args, flags, incomplete)
    write_pidfile()  # lets bench/chip_check reclaim the exclusive chip
    print(f"Fine-tuning sweep: {len(grid)} runs (shard "
          f"{args.shard_index}/{args.num_shards})")
    failed = []
    for i, (domain, strategy, scheme, seed) in enumerate(grid):
        cfg = config.FinetuneConfig(domain_name=domain,
                                    finetune_strategy=strategy,
                                    pretrained_scheme=scheme, seed=seed)
        if args.resume and cell_completed(cfg, args):
            print(f"[{i+1}/{len(grid)}] {cfg.run_name}: already complete, skipping")
            continue
        if not pretrain_ready(scheme, seed, args):
            failed.append(cfg.run_name)
            print(f"[{i+1}/{len(grid)}] {cfg.run_name}: SKIPPED — pretrain "
                  f"{scheme}_{seed} has no completed-fidelity marker")
            continue
        # start marker keeps the log fresh for the staleness watchdog
        print(f"[{i+1}/{len(grid)}] {cfg.run_name}: starting", flush=True)
        t0 = time.time()
        try:
            res = finetune(cfg, aggregation=args.aggregation,
                           epochs=args.epochs, use_wandb=not args.no_wandb,
                           out_root=args.out_root,
                           processed_dir=args.processed_dir,
                           **_parallel_kwargs(args, cfg))
            key = ("test/auc" if cfg.task_type == "link_prediction"
                   else "test/accuracy")
            print(f"[{i+1}/{len(grid)}] {cfg.run_name}: {key}="
                  f"{res[key]:.4f} ({time.time()-t0:.0f}s)")
        except Exception:
            traceback.print_exc()
            failed.append(cfg.run_name)
            print(f"[{i+1}/{len(grid)}] {cfg.run_name}: FAILED")
        if maybe_clear_caches():
            print(f"[{i+1}/{len(grid)}] cleared jit caches (host RSS bound)")
    if failed:
        print(f"\n{len(failed)} failed runs: {failed}")
    else:
        print("\nAll runs completed.")
    return failed


def main() -> None:
    maybe_init_distributed()
    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--domain_sweep", type=str, default=None)
    parser.add_argument("--domain_name", type=str, default=None)
    parser.add_argument("--finetune_strategy", type=str, default=None)
    parser.add_argument("--pretrained_scheme", type=str, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--aggregation", type=str, default="pallas",
                        choices=["dense", "pallas", "coo", "csr"])
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--partition", type=str, default="none",
                        choices=["none", "edge", "node"],
                        help="shard full-graph cells (node/link tasks) over "
                             "all local devices: 'edge' = edge-partitioned "
                             "aggregation (psum'd [N,F] partials), 'node' = "
                             "halo-exchange node partitioning (bytes ∝ edge "
                             "cut). Ignored for graph-classification cells.")
    add_sweep_args(parser)
    parser.add_argument("--processed_dir", type=str, default=None,
                        help="alternate processed-data store (e.g. a scaled "
                             "synthetic store for the 16k-node CSR cell)")
    parser.add_argument("--out_root", type=str, default=None,
                        help="root for checkpoints/metrics (default: the "
                             "production outputs/ store); point smoke runs "
                             "at a scratch dir so they cannot overwrite "
                             "production artifacts")
    args = parser.parse_args()

    if args.sweep:
        if run_grid(full_grid(), args):
            raise SystemExit(2)
    elif args.domain_sweep:
        grid = [c for c in full_grid() if c[0] == args.domain_sweep]
        if run_grid(grid, args):
            raise SystemExit(2)
    else:
        if not all((args.domain_name, args.finetune_strategy,
                    args.pretrained_scheme)) or args.seed is None:
            parser.error("provide --sweep, --domain_sweep, or all of "
                         "--domain_name --finetune_strategy "
                         "--pretrained_scheme --seed")
        cfg = config.FinetuneConfig(domain_name=args.domain_name,
                                    finetune_strategy=args.finetune_strategy,
                                    pretrained_scheme=args.pretrained_scheme,
                                    seed=args.seed)
        res = finetune(cfg, aggregation=args.aggregation, epochs=args.epochs,
                       use_wandb=not args.no_wandb, out_root=args.out_root,
                       processed_dir=args.processed_dir,
                       **_parallel_kwargs(args, cfg))
        print({k: round(v, 4) if isinstance(v, float) else v
               for k, v in res.items()})


if __name__ == "__main__":
    main()
