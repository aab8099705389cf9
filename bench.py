"""Benchmark: edges/s/chip for GIN SpMM aggregation, fwd+bwd, Cora shape.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

The reference publishes no kernel numbers (BASELINE.md: ``published = {}``);
``vs_baseline`` therefore reports the Pallas MXU kernel (default ``split``
precision mode, bf16-stored adjacency — ~4e-5 relative error) against the
in-repo XLA ``segment_sum`` COO path (the reference-semantics implementation
a naive port would use), same chip, same process.

Method: one fwd + one bwd per iteration through the kernel's custom VJP,
iterated inside a jitted ``fori_loop``; timing uses the slope between two
iteration counts so fixed per-call costs (relay RPC, host transfers) cancel
(utils/profiling.slope_time). edges/s = E_real / marginal-iteration-time.
"""

from __future__ import annotations

import json
from functools import partial

import numpy as np

CORA_N, CORA_E, F = 2708, 10556, 256


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gnn_pretraining_tpu.ops.spmm import (
        build_dense_adjacency,
        gin_aggregate_coo,
        spmm_pallas,
    )
    from gnn_pretraining_tpu.utils.profiling import slope_time
    from gnn_pretraining_tpu.utils.runtime import setup_jax

    setup_jax()
    rng = np.random.default_rng(0)
    senders = jnp.asarray(rng.integers(0, CORA_N, CORA_E), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, CORA_N, CORA_E), jnp.int32)
    edge_mask = jnp.ones(CORA_E, jnp.float32)
    h = jnp.asarray(rng.normal(size=(CORA_N, F)), jnp.float32)
    eps = jnp.float32(0.1)
    adj_bf = build_dense_adjacency(senders, receivers, edge_mask, CORA_N,
                                   dtype=jnp.bfloat16)

    @partial(jax.jit, static_argnames=("iters",))
    def run_pallas(a, x, iters):
        grad = jax.grad(lambda xx: jnp.sum(spmm_pallas(a, xx, eps, "split") ** 2))

        def body(i, acc):
            g = grad(acc)
            return g / (1e-6 + jnp.max(jnp.abs(g)))

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    @partial(jax.jit, static_argnames=("iters",))
    def run_coo(s, r, m, x, iters):
        grad = jax.grad(lambda xx: jnp.sum(
            gin_aggregate_coo(xx, s, r, m, eps) ** 2))

        def body(i, acc):
            g = grad(acc)
            return g / (1e-6 + jnp.max(jnp.abs(g)))

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    t_pallas = slope_time(lambda it: (lambda: run_pallas(adj_bf, h, iters=it)))
    t_coo = slope_time(lambda it: (lambda: run_coo(senders, receivers,
                                                   edge_mask, h, iters=it)))

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
