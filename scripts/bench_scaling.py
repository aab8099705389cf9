"""Edge-partitioned aggregation scaling harness.

Measures fwd+bwd edges/s of the edge-partitioned 5-layer GIN message passing
at 1/2/4/8 ways and reports scaling efficiency (BASELINE.md kernel metric:
edges/s at 1 chip / 1 host / ≥2 hosts, ≥80% target).

On this build environment only one physical TPU chip is reachable, so by
default the harness runs on virtual CPU devices — that validates the
*method* (sharding, collectives, measurement) but not TPU numbers; on a real
multi-chip slice the same script runs unchanged with ``--platform tpu``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--max_devices", type=int, default=8)
    p.add_argument("--nodes", type=int, default=8192)
    p.add_argument("--edges", type=int, default=262144)
    p.add_argument("--features", type=int, default=256)
    args = p.parse_args()

    import os

    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={args.max_devices}")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from gnn_pretraining_tpu.ops.spmm import gin_aggregate_coo
    from gnn_pretraining_tpu.parallel.edge_partition import (
        edge_partitioned_aggregate,
        shard_edges,
    )
    from gnn_pretraining_tpu.parallel.mesh import make_mesh
    from gnn_pretraining_tpu.utils.profiling import slope_time

    rng = np.random.default_rng(0)
    n, e, f = args.nodes, args.edges, args.features
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    edge_mask = np.ones(e, np.float32)
    h = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    eps = jnp.float32(0.1)

    results = {}
    n_avail = len(jax.devices())
    ways = [w for w in (1, 2, 4, 8) if w <= min(args.max_devices, n_avail)]
    for ndev in ways:
        mesh = make_mesh(n_data=1, n_edge=ndev)
        s, r, m = shard_edges(senders, receivers, edge_mask, ndev)
        s, r, m = jnp.asarray(s), jnp.asarray(r), jnp.asarray(m)

        def make_run(iters):
            import functools

            @functools.partial(jax.jit, static_argnames=("it",))
            def run(x, it):
                def grad_fn(xx):
                    if ndev == 1:
                        out = gin_aggregate_coo(xx, s, r, m, eps)
                    else:
                        out = edge_partitioned_aggregate(mesh, xx, s, r, m, eps)
                    return jnp.sum(out ** 2)

                g = jax.grad(grad_fn)

                def body(i, acc):
                    gg = g(acc)
                    return gg / (1e-6 + jnp.max(jnp.abs(gg)))

                return jnp.sum(jax.lax.fori_loop(0, it, body, x))

            return lambda: run(h, it=iters)

        t = slope_time(make_run, n1=3, n2=13, reps=2)
        results[ndev] = e / t
        base = results[ways[0]] * ndev / ways[0]
        eff = results[ndev] / base
        print(f"{ndev} device(s): {results[ndev]/1e6:8.2f} M edges/s "
              f"(efficiency {eff:5.1%})", flush=True)

    # ---- boundary-aware halo-exchange path (VERDICT r1 #5) ----------------
    from gnn_pretraining_tpu.parallel.node_partition import (
        build_node_partition_plan,
        node_partitioned_aggregate,
        pad_node_rows,
    )

    np_results, np_bytes = {}, {}
    for ndev in ways:
        if ndev == 1:
            np_results[1] = results[1]
            np_bytes[1] = 0
            continue
        mesh = make_mesh(n_data=1, n_edge=ndev)
        plan = build_node_partition_plan(senders, receivers, edge_mask, n,
                                         ndev)
        hp = jnp.asarray(pad_node_rows(np.asarray(h), plan))

        def make_run(iters):
            import functools

            @functools.partial(jax.jit, static_argnames=("it",))
            def run(x, it):
                g = jax.grad(lambda xx: jnp.sum(node_partitioned_aggregate(
                    mesh, xx, plan, eps) ** 2))

                def body(i, acc):
                    gg = g(acc)
                    return gg / (1e-6 + jnp.max(jnp.abs(gg)))

                return jnp.sum(jax.lax.fori_loop(0, it, body, x))

            return lambda: run(hp, it=iters)

        t = slope_time(make_run, n1=3, n2=13, reps=2)
        np_results[ndev] = e / t
        np_bytes[ndev] = plan.halo_bytes_per_layer(f)
        psum_b = plan.psum_bytes_per_layer(f)
        print(f"{ndev}-way halo: {np_results[ndev]/1e6:8.2f} M edges/s, "
              f"{np_bytes[ndev]/1e6:.2f} MB/layer moved "
              f"(psum path: {psum_b/1e6:.2f} MB/layer)", flush=True)

    print(json.dumps({
        "metric": "edge_partitioned_scaling",
        "platform": args.platform,
        "edges_per_s": {str(k): round(v, 1) for k, v in results.items()},
        "halo_edges_per_s": {str(k): round(v, 1)
                             for k, v in np_results.items()},
        "halo_bytes_per_layer": np_bytes,
    }))


if __name__ == "__main__":
    main()
