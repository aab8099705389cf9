"""Benchmark: edges/s/chip for GIN SpMM aggregation, fwd+bwd, Cora shape.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

The reference publishes no kernel numbers (BASELINE.md: ``published = {}``);
``vs_baseline`` therefore reports the Pallas MXU kernel against the in-repo
XLA ``segment_sum`` COO path (the reference-semantics implementation a naive
port would use) measured on the same chip in the same process.

Method: ``value_and_grad`` of a scalar readout of ``A@H + (1+eps)H`` — one
fwd + one bwd per iteration — iterated inside a single jitted ``fori_loop``
so tunnel/dispatch latency is excluded; edges/s = E_real · iters / wall.
"""

from __future__ import annotations

import json
import time

import numpy as np

CORA_N, CORA_E, F = 2708, 10556, 256
ITERS = 100


def _timed(fn, *args) -> float:
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gnn_pretraining_tpu.ops.spmm import (
        build_dense_adjacency,
        gin_aggregate_coo,
        spmm_pallas,
    )
    from gnn_pretraining_tpu.utils.runtime import setup_jax

    setup_jax()
    rng = np.random.default_rng(0)
    senders = jnp.asarray(rng.integers(0, CORA_N, CORA_E), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, CORA_N, CORA_E), jnp.int32)
    edge_mask = jnp.ones(CORA_E, jnp.float32)
    h = jnp.asarray(rng.normal(size=(CORA_N, F)), jnp.float32)
    eps = jnp.float32(0.1)
    adj = build_dense_adjacency(senders, receivers, edge_mask, CORA_N)

    def loop(grad_fn):
        @jax.jit
        def run(x):
            def body(i, acc):
                g = grad_fn(acc)
                return acc + 0.0 * g  # keep the chain alive without drift
            return jax.lax.fori_loop(0, ITERS, body, x)

        return run

    pallas_grad = jax.grad(lambda x: jnp.sum(spmm_pallas(adj, x, eps) ** 2))
    coo_grad = jax.grad(lambda x: jnp.sum(
        gin_aggregate_coo(x, senders, receivers, edge_mask, eps) ** 2))

    t_pallas = _timed(loop(pallas_grad), h)
    t_coo = _timed(loop(coo_grad), h)

    edges_per_s = CORA_E / t_pallas
    vs_baseline = t_coo / t_pallas  # >1 ⇒ Pallas beats the XLA COO path

    print(json.dumps({
        "metric": "spmm_fwd_bwd_edges_per_s_cora",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
