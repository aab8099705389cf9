"""Empirical dense-vs-sparse aggregation crossover scan (VERDICT r1 weak #4).

The framework's training-path aggregation is *dense*: the padded adjacency is
materialized once per batch and `A @ H` rides the MXU (`ops/spmm.py`,
`spmm_pallas` / `gin_aggregate_dense`). At Cora scale this is the right TPU
call even though the graph is 0.14% dense — per-edge the kernel does ~700x
redundant MACs, but the MXU's bf16 throughput dwarfs the VPU scatter path.
That stops being true at some N: dense work grows as N^2*F while the COO
`segment_sum` path grows as E*F = d*N*F at fixed average degree d.

This scan measures both paths fwd+bwd across N at Cora-like degree (d≈3.9)
and prints the measured crossover, one JSON line per size. Run on the real
chip (plain `python`); on CPU it still runs but the numbers are meaningless
for the TPU design question.

Usage: python scripts/crossover_scan.py [--feat 256] [--degree 3.9]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def scan(sizes, feat, degree, band=0):
    import jax
    import jax.numpy as jnp

    from gnn_pretraining_tpu.ops.spmm import (
        build_dense_adjacency,
        gin_aggregate_coo,
        spmm_pallas,
    )
    from gnn_pretraining_tpu.utils.profiling import slope_time

    from gnn_pretraining_tpu.ops.spmm_csr import (
        build_block_csr,
        gin_aggregate_csr,
        synthetic_banded_edges,
    )

    eps = jnp.float32(0.1)
    rows = []
    for n in sizes:
        e = int(degree * n)
        rng = np.random.default_rng(n)
        if band:
            senders_np, receivers_np = synthetic_banded_edges(n, e, band, rng)
        else:
            senders_np = rng.integers(0, n, e).astype(np.int32)
            receivers_np = rng.integers(0, n, e).astype(np.int32)
        senders = jnp.asarray(senders_np)
        receivers = jnp.asarray(receivers_np)
        edge_mask = jnp.ones(e, jnp.float32)
        h = jnp.asarray(rng.normal(size=(n, feat)).astype(np.float32))
        bsr = build_block_csr(senders_np, receivers_np,
                              np.ones(e, np.float32), n, dtype=jnp.bfloat16)

        def fwd_bwd_coo(x, s, r, m):
            out, vjp = jax.vjp(
                lambda hh: gin_aggregate_coo(hh, s, r, m, eps), x)
            return vjp(out)[0]

        def fwd_bwd_csr(x, b):
            out, vjp = jax.vjp(
                lambda hh: gin_aggregate_csr(hh, b, eps, "split"), x)
            return vjp(out)[0]

        def timed(fn, *operands):
            # Graph operands are jit arguments, never closures: a closed-over
            # 8192^2 f32 adjacency (256 MB) ships with the executable to the
            # remote compiler (CLAUDE.md).
            stepped = jax.jit(lambda x, iters, *ops: jnp.sum(jax.lax.fori_loop(
                0, iters, lambda _, xx: fn(xx, *ops), x)))
            def run(iters):
                return lambda: stepped(h, iters, *operands)
            return slope_time(run)

        row = {"n": n, "e": e, "feat": feat, "nnzb": bsr.nnzb,
               "band": band or 0}
        # dense only in its design regime — a 32768^2 f32 adjacency is 4 GB
        from gnn_pretraining_tpu.config import DENSE_ADJACENCY_MAX_NODES
        if n <= DENSE_ADJACENCY_MAX_NODES:
            adj = build_dense_adjacency(senders, receivers, edge_mask, n)

            def fwd_bwd_dense(x, a):
                out, vjp = jax.vjp(lambda hh: spmm_pallas(a, hh, eps), x)
                return vjp(out)[0]

            t_dense = timed(fwd_bwd_dense, adj)
            row["dense_edges_per_s"] = round(e / t_dense, 1)
        t_coo = timed(fwd_bwd_coo, senders, receivers, edge_mask)
        t_csr = timed(fwd_bwd_csr, bsr)
        row["coo_edges_per_s"] = round(e / t_coo, 1)
        row["csr_edges_per_s"] = round(e / t_csr, 1)
        row["csr_over_coo"] = round(t_coo / t_csr, 3)
        if "dense_edges_per_s" in row:
            row["dense_over_coo"] = round(t_coo * row["dense_edges_per_s"] / e,
                                          3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    cross = next((r["n"] for r in rows
                  if r.get("dense_over_coo", 9e9) < 1.0), None)
    dense_ns = [r["n"] for r in rows if "dense_edges_per_s" in r]
    if cross is not None:
        note = f"COO overtakes dense at N>={cross}"
    elif dense_ns:
        note = (f"dense wins at every measured size (N<={max(dense_ns)}; "
                "larger sizes scanned CSR/COO only)")
    else:
        note = "dense not measured at any scanned size"
    print(json.dumps({"crossover_n": cross, "note": note}))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--feat", type=int, default=256)
    p.add_argument("--degree", type=float, default=3.9)
    p.add_argument("--sizes", type=int, nargs="*",
                   default=[1024, 2048, 4096, 8192, 16384, 32768])
    p.add_argument("--band", type=int, default=0,
                   help="banded edges (|dst-src| ~ Geom, capped here): the "
                        "locality regime where block-CSR tiles stay sparse; "
                        "0 = uniform random (CSR degenerates toward dense)")
    args = p.parse_args()
    scan(args.sizes, args.feat, args.degree, args.band)


if __name__ == "__main__":
    main()
