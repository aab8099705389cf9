"""Pretraining sweep driver.

CLI surface mirrors the reference's run_pretrain.py (``--sweep`` | single
``--exp_name --seed``). The reference fans out subprocesses across GPUs
(ThreadPoolExecutor, run_pretrain.py:57); on a single TPU host the grid runs
sequentially with per-cell completion markers
(``outputs/metrics/<project>/<run>.summary.json``) so an interrupted sweep is
re-runnable (``--resume`` skips completed cells — SURVEY.md §5 failure
recovery).

``--isolate N`` runs the grid as child processes of N cells each (the
reference's subprocess fan-out, serialized for the exclusive chip): host RSS
dies with every child. The in-process sweep retraces fresh programs per cell
and ``jax.clear_caches()`` does not return the pages to the OS (observed:
RSS ≥32 GB from cell 11 on despite clearing after every cell, kernel
OOM-kill at 130 GB during cell 21/24), so process isolation is the only
reliable bound; the persistent on-disk compile cache keeps children warm.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
import traceback
from pathlib import Path

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.utils.runtime import (
    maybe_clear_caches,
    maybe_init_distributed,
    setup_jax,
    write_pidfile,
)
from gnn_pretraining_tpu.pretrain.pretrain import pretrain
from gnn_pretraining_tpu.utils.logging import record_pretrain_timing


def shard_grid(grid, args):
    """Partition the experiment grid across hosts (SURVEY.md §2.6: the
    reference splits its grid across 2 VMs by hand; here round-robin by
    ``--shard_index/--num_shards``, defaulting to the jax process index under
    multi-host). Giving only one of the two flags is ambiguous — two hosts
    launched with just ``--num_shards 2`` would both run shard 0 — so it is
    rejected rather than silently defaulted."""
    import jax

    if (args.num_shards > 0) != (args.shard_index is not None):
        raise SystemExit("--shard_index and --num_shards must be given "
                         "together (or neither, to use the jax process "
                         "index under multi-host)")
    if args.num_shards:
        n, i = args.num_shards, args.shard_index
    elif getattr(args, "isolate", 0):
        # The isolate orchestrator must never init a backend (the relay
        # serializes backend init — a chip probe here would block its own
        # children); without explicit shard flags it is single-host.
        return grid
    else:
        n, i = jax.process_count(), jax.process_index()
    if not 0 <= i < max(n, 1):
        raise SystemExit(f"--shard_index {i} out of range for {n} shards")
    return grid[i::n] if n > 1 else grid


def slice_grid(grid, args):
    """Contiguous slice of the (sharded) grid — the unit an ``--isolate``
    child executes. Slicing after sharding keeps parent/child grids aligned
    (children receive the parent's shard flags verbatim)."""
    if getattr(args, "grid_count", 0):
        return grid[args.grid_start:args.grid_start + args.grid_count]
    return grid


def run_isolated(script: str, grid, args, child_flags, incomplete) -> None:
    """Execute the sweep as chunked child processes (``args.isolate`` cells
    per child) so host memory is returned to the OS between chunks.

    Children inherit stdout/stderr (the sweep log keeps its per-cell lines
    for the watchdog and sweep_report). A nonzero/killed child is logged and
    the pass continues — its unfinished cells are retried on the next
    watchdog pass via ``--resume``. Exits 1 when any cell is still
    incomplete afterwards so the production wrapper aborts instead of
    cascading into the next phase with holes."""
    from gnn_pretraining_tpu.utils.runtime import honor_pause

    total = len(grid)
    for start in range(0, total, args.isolate):
        count = min(args.isolate, total - start)
        if args.resume and not any(map(incomplete, grid[start:start + count])):
            print(f"[isolate] cells {start + 1}-{start + count}/{total}: "
                  "all complete, skipping child", flush=True)
            continue
        # Chunk boundary = the only moment no process holds the exclusive
        # chip; loan it out here if bench/chip_check asked (acquire_chip).
        honor_pause(f"cells {start + 1}-{start + count}")
        cmd = [sys.executable, str(Path(__file__).parent / script),
               *child_flags,
               "--grid_start", str(start), "--grid_count", str(count)]
        print(f"[isolate] cells {start + 1}-{start + count}/{total}",
              flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"[isolate] child rc={rc} (cells {start + 1}-"
                  f"{start + count}) — continuing", flush=True)
    missing = [name for name in map(incomplete, grid) if name]
    if missing:
        print(f"\n{len(missing)} cells incomplete after this pass: "
              f"{missing[:10]}{' ...' if len(missing) > 10 else ''}",
              flush=True)
        raise SystemExit(1)
    print("\nAll runs completed.")


def common_child_flags(args) -> list:
    flags = ["--sweep", "--aggregation", args.aggregation]
    if getattr(args, "dp", "off") != "off":
        flags += ["--dp", args.dp]
    if getattr(args, "partition", "none") != "none":
        flags += ["--partition", args.partition]
    if args.resume:
        flags.append("--resume")
    if args.no_wandb:
        flags.append("--no_wandb")
    if args.epochs is not None:
        flags += ["--epochs", str(args.epochs)]
    if args.out_root:
        flags += ["--out_root", str(args.out_root)]
    if getattr(args, "processed_dir", None):
        flags += ["--processed_dir", str(args.processed_dir)]
    if args.num_shards:
        flags += ["--shard_index", str(args.shard_index),
                  "--num_shards", str(args.num_shards)]
    return flags


def metrics_root(args):
    from pathlib import Path

    root = getattr(args, "out_root", None)
    return Path(root) / "metrics" if root else config.METRICS_DIR


def cell_completed(cfg, args) -> bool:
    """Fidelity-aware completion check: the summary must exist, be complete,
    and match the requested epochs/aggregation/data provenance (a smoke run
    can never mask a production cell — VERDICT r1 weak #1)."""
    from gnn_pretraining_tpu.utils.fidelity import (
        cell_completed as _check,
        fidelity_block,
    )

    path = (metrics_root(args) / config.PRETRAIN_PROJECT_NAME
            / f"{cfg.run_name}.summary.json")
    expected = fidelity_block(args.epochs, cfg.seed, args.aggregation,
                              getattr(args, "processed_dir", None),
                              cfg.pretrain_domains)
    return _check(path, expected)


def run_sweep(args):
    grid = [(e, s) for e in config.ALL_SCHEMES for s in config.SEEDS]
    grid = slice_grid(shard_grid(grid, args), args)
    if getattr(args, "isolate", 0):
        def incomplete(cell):
            cfg = config.PretrainConfig(exp_name=cell[0], seed=cell[1])
            return None if cell_completed(cfg, args) else cfg.run_name
        return run_isolated("run_pretrain.py", grid, args,
                            common_child_flags(args), incomplete)
    write_pidfile()  # lets bench/chip_check reclaim the exclusive chip
    print(f"Pretraining sweep: {len(grid)} runs (shard "
          f"{args.shard_index}/{args.num_shards})")
    failed = []
    for i, (exp, seed) in enumerate(grid):
        cfg = config.PretrainConfig(exp_name=exp, seed=seed)
        if args.resume and cell_completed(cfg, args):
            print(f"[{i+1}/{len(grid)}] {cfg.run_name}: already complete, skipping")
            continue
        t0 = time.time()
        try:
            res = pretrain(cfg, aggregation=args.aggregation,
                           epochs=args.epochs, use_wandb=not args.no_wandb,
                           resume=args.resume, out_root=args.out_root,
                           processed_dir=args.processed_dir,
                           data_parallel=args.dp == "auto")
            print(f"[{i+1}/{len(grid)}] {cfg.run_name}: "
                  f"best_val={res['best_val_total']:.4f} "
                  f"({time.time()-t0:.0f}s)")
            # Production-fidelity cells feed the tracked wall-clock record
            # (reduced-epoch mini sweeps and tmp out_roots stay out of it).
            if (args.epochs in (None, config.PRETRAIN_EPOCHS)
                    and args.out_root is None):
                record_pretrain_timing(cfg.run_name, time.time() - t0)
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


def add_sweep_args(parser) -> None:
    parser.add_argument("--shard_index", type=int, default=None)
    parser.add_argument("--num_shards", type=int, default=0)
    parser.add_argument("--isolate", type=int, default=0, metavar="N",
                        help="run the grid as child processes of N cells "
                             "each (bounds host RSS; see module docstring)")
    parser.add_argument("--dp", type=str, default="off",
                        choices=["off", "auto"],
                        help="data parallelism: 'auto' shards each step's "
                             "graphs over all local devices with exact "
                             "semantics (SyncBN, psum'd losses, global "
                             "contrastive negatives — parallel/"
                             "data_parallel.py for pretraining, finetune/"
                             "gc_data_parallel.py for graph-classification "
                             "cells), falling back to the single-device "
                             "path when only one device is visible")
    parser.add_argument("--grid_start", type=int, default=0,
                        help=argparse.SUPPRESS)  # isolate-child slice
    parser.add_argument("--grid_count", type=int, default=0,
                        help=argparse.SUPPRESS)


def main() -> None:
    maybe_init_distributed()
    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="skip runs whose completion marker exists")
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=config.PRETRAIN_EPOCHS)
    parser.add_argument("--aggregation", type=str, default="pallas",
                        choices=["dense", "pallas", "coo"])
    parser.add_argument("--no_wandb", action="store_true")
    add_sweep_args(parser)
    parser.add_argument("--out_root", type=str, default=None,
                        help="root for checkpoints/metrics (default: the "
                             "production outputs/ store); point smoke runs "
                             "at a scratch dir so they cannot overwrite "
                             "production artifacts")
    parser.add_argument("--processed_dir", type=str, default=None,
                        help="alternate processed-data store (smoke/test "
                             "stores; default: data/processed)")
    args = parser.parse_args()

    if args.sweep:
        if run_sweep(args):
            raise SystemExit(2)
    else:
        if args.exp_name is None or args.seed is None:
            parser.error("provide --sweep or both --exp_name and --seed")
        cfg = config.PretrainConfig(exp_name=args.exp_name, seed=args.seed)
        res = pretrain(cfg, aggregation=args.aggregation, epochs=args.epochs,
                       use_wandb=not args.no_wandb, resume=args.resume,
                       out_root=args.out_root, processed_dir=args.processed_dir,
                       data_parallel=args.dp == "auto")
        print(res)


if __name__ == "__main__":
    main()
