"""Decompose the 16k-node NC cell's steady per-step time on the chip.

csr_cell.json (round 5) shows the steady dispatch period at ~0.30 s/epoch
for BOTH aggregations — ~20x the back-of-envelope compute (5-layer MLPs
~3 ms, aggregation 3-15 ms, eval ~5 ms). This probe slope-times the cell's
actual components at the exact production shapes to find the floor:

  train      — one train_one step (fwd+bwd+AdamW), as in the fused runner
  eval       — one eval_one forward
  fwd        — model forward only (train=False)
  agg        — 5x the aggregation alone (fwd+bwd)
  mlp        — 5x the GIN MLP matmuls alone (fwd+bwd)

Writes analysis/results/nc16k_probe.json. Chip-cooperative (acquire_chip).
"""

from __future__ import annotations

import json
import sys
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gnn_pretraining_tpu import config  # noqa: E402
from gnn_pretraining_tpu.utils.runtime import acquire_chip, setup_jax  # noqa: E402

RESULTS = REPO / "analysis" / "results" / "nc16k_probe.json"


def main() -> None:
    setup_jax()
    acquire_chip(wait_s=3600.0)

    import jax
    import jax.numpy as jnp

    from gnn_pretraining_tpu.data.loaders import create_finetune_arrays
    from gnn_pretraining_tpu.finetune.finetune import (
        create_finetune_optimizer,
    )
    from gnn_pretraining_tpu.finetune.runners import _graph_dict, _nc_fns
    from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
    from gnn_pretraining_tpu.ops.spmm import gin_aggregate_coo
    from gnn_pretraining_tpu.utils.profiling import slope_time

    store = REPO / "data" / "processed_6x"
    cfg = config.FinetuneConfig(domain_name="Cora_NC",
                                finetune_strategy="full_finetune",
                                pretrained_scheme="b1", seed=42)
    data = create_finetune_arrays("Cora_NC", "train", -1, processed_dir=store)
    g = data.graph
    n = g.x.shape[0]
    e = int(np.asarray(g.edge_mask).sum())
    print(f"n={n} e={e}", flush=True)

    model = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(g.x), jnp.asarray(g.node_mask), False,
        senders=jnp.asarray(g.senders), receivers=jnp.asarray(g.receivers),
        edge_mask=jnp.asarray(g.edge_mask))
    optimizer, labels, _ = create_finetune_optimizer(variables["params"], cfg)
    state = (variables["params"], variables["batch_stats"],
             optimizer.init(variables["params"]))
    train_one, eval_one = _nc_fns(model, cfg, optimizer, labels)

    aux = {"graph": _graph_dict(g), "adj": None, "bsr": None}
    aux = jax.device_put(aux)
    state = jax.device_put(state)
    ix = jnp.asarray(np.asarray(data.node_indices[0]))
    y = jnp.asarray(np.asarray(data.labels[0]))
    mask = jnp.ones_like(y, jnp.float32)
    b = {"idx": ix, "y": y, "mask": mask}
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnames=("iters",))
    def run_train(st, iters):
        def body(s, i):
            s2, _ = train_one(s, b, aux, jax.random.fold_in(key, i))
            return s2, ()
        st, _ = jax.lax.scan(body, st, jnp.arange(iters))
        return jax.tree.leaves(st)[0].sum()

    @partial(jax.jit, static_argnames=("iters",))
    def run_eval(st, iters):
        def body(acc, i):
            logs = eval_one(st, b, aux)
            return acc + logs[0], ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    params, stats, _ = state
    x = jnp.asarray(g.x)

    @partial(jax.jit, static_argnames=("iters",))
    def run_fwd(xx, iters):
        def body(acc, i):
            out = model.apply({"params": params, "batch_stats": stats},
                              xx + acc * 0, jnp.asarray(g.node_mask), False,
                              senders=aux["graph"]["senders"],
                              receivers=aux["graph"]["receivers"],
                              edge_mask=aux["graph"]["edge_mask"])
            return jnp.sum(out) * 1e-12, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    h0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, config.GNN_HIDDEN_DIM)).astype(np.float32))
    eps = jnp.float32(0.1)

    @partial(jax.jit, static_argnames=("iters",))
    def run_agg(h, iters):
        def loss(hh):
            z = hh
            for _ in range(config.GNN_NUM_LAYERS):
                z = gin_aggregate_coo(z, aux["graph"]["senders"],
                                      aux["graph"]["receivers"],
                                      aux["graph"]["edge_mask"], eps)
            return jnp.sum(z ** 2)
        def body(acc, i):
            gr = jax.grad(loss)(h + acc * 0)
            return jnp.sum(gr) * 1e-12, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    w1 = jnp.asarray(np.random.default_rng(1).normal(
        size=(256, 512)).astype(np.float32) * 0.01)
    w2 = jnp.asarray(np.random.default_rng(2).normal(
        size=(512, 256)).astype(np.float32) * 0.01)

    @partial(jax.jit, static_argnames=("iters",))
    def run_mlp(h, iters):
        def loss(hh):
            z = hh
            for _ in range(config.GNN_NUM_LAYERS):
                z = jnp.maximum(z @ w1, 0) @ w2 + z
            return jnp.sum(z ** 2)
        def body(acc, i):
            gr = jax.grad(loss)(h + acc * 0)
            return jnp.sum(gr) * 1e-12, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    res = {"n": n, "e": e}
    for name, fn, arg in (("train_step", run_train, state),
                          ("eval_step", run_eval, state),
                          ("fwd_only", run_fwd, x),
                          ("agg5_fwd_bwd", run_agg, h0),
                          ("mlp5_fwd_bwd", run_mlp, h0)):
        t = slope_time(lambda it, fn=fn, arg=arg: (lambda: fn(arg, iters=it)))
        res[name + "_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)

    # Device-side FULL epoch body (train step + val eval + log stacking, the
    # fused runner's scan content) per aggregation — the end-to-end
    # steady-state comparison with the host metric loop and relay dispatch
    # excluded (they are aggregation-independent; see csr_cell.json note).
    from gnn_pretraining_tpu.finetune.runners import _csr_graph_aux

    def epoch_runner(fns):
        train1, eval1 = fns

        # aux/batch are jit ARGUMENTS: closed-over arrays ship with the
        # compile request to the remote compiler (the 93 MB feature matrix
        # overflowed its body limit — HTTP 413).
        @partial(jax.jit, static_argnames=("iters",))
        def run(st, bb, ax, iters):
            def epoch(s, eidx):
                s2, tlogs = train1(s, bb, ax, jax.random.fold_in(key, eidx))
                vlogs = eval1(s2, bb, ax)
                return s2, (tlogs[0], vlogs[0])
            st, logs = jax.lax.scan(epoch, st, jnp.arange(iters))
            return jax.tree.leaves(st)[0].sum() + logs[0].sum() + logs[1].sum()
        return run

    run_epoch_coo = epoch_runner((train_one, eval_one))

    gd_csr, bsr, inv = _csr_graph_aux(g)
    model_csr = FinetuneGNN(domain_name="Cora_NC", aggregation="csr")
    fns_csr = _nc_fns(model_csr, cfg, optimizer, labels)
    aux_csr = jax.device_put({"graph": gd_csr, "adj": None, "bsr": bsr})
    # node indices remapped like the production csr path
    b_csr = {"idx": jnp.asarray(inv)[ix], "y": y, "mask": mask}

    run_epoch_csr = epoch_runner(fns_csr)

    for name, fn, bb, ax in (("epoch_body_coo", run_epoch_coo, b, aux),
                             ("epoch_body_csr", run_epoch_csr, b_csr,
                              aux_csr)):
        t = slope_time(lambda it, fn=fn, bb=bb, ax=ax:
                       (lambda: fn(state, bb, ax, iters=it)))
        res[name + "_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
    if res.get("epoch_body_csr_ms"):
        res["csr_vs_coo_device_epoch"] = round(
            res["epoch_body_coo_ms"] / res["epoch_body_csr_ms"], 3)
        print("csr_vs_coo_device_epoch:", res["csr_vs_coo_device_epoch"])

    # Same epoch-body comparison on a BANDED 16k graph (the kernel bench's
    # structure: avg_deg 8, band 512 — high tile locality after RCM-style
    # ordering). Separates "CSR wins where the structure tiles well" from
    # the Cora-shape result above (avg_deg ~4, scattered: mostly-empty
    # (128,128) tiles make CSR lose to COO at the epoch level).
    from gnn_pretraining_tpu.ops.spmm_csr import (
        build_block_csr,
        synthetic_banded_edges,
    )

    nb_, avg_deg, band = 16384, 8, 512
    eb = nb_ * avg_deg
    rng_b = np.random.default_rng(7)
    bs, br = synthetic_banded_edges(nb_, eb, band, rng_b)
    bmask = np.ones(eb, np.float32)
    gd_band = {"x": jnp.asarray(rng_b.normal(size=(nb_, 50)).astype(np.float32)),
               "senders": jnp.asarray(bs), "receivers": jnp.asarray(br),
               "edge_mask": jnp.asarray(bmask),
               "node_mask": jnp.ones(nb_, jnp.float32)}
    bsr_band = build_block_csr(bs, br, bmask, nb_)
    model_b = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
    vb = model_b.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        gd_band["x"], gd_band["node_mask"], False,
        senders=gd_band["senders"], receivers=gd_band["receivers"],
        edge_mask=gd_band["edge_mask"])
    opt_b, labels_b, _ = create_finetune_optimizer(vb["params"], cfg)
    state_b = jax.device_put((vb["params"], vb["batch_stats"],
                              opt_b.init(vb["params"])))
    fns_b_coo = _nc_fns(model_b, cfg, opt_b, labels_b)
    fns_b_csr = _nc_fns(FinetuneGNN(domain_name="Cora_NC",
                                    aggregation="csr"), cfg, opt_b, labels_b)
    ixb = jnp.arange(0, nb_, 20)
    bb_band = {"idx": ixb,
               "y": jnp.asarray(rng_b.integers(0, 7, len(ixb))),
               "mask": jnp.ones(len(ixb), jnp.float32)}
    aux_b_coo = jax.device_put({"graph": gd_band, "adj": None, "bsr": None})
    aux_b_csr = jax.device_put({"graph": gd_band, "adj": None,
                                "bsr": bsr_band})
    run_b_coo = epoch_runner(fns_b_coo)
    run_b_csr = epoch_runner(fns_b_csr)
    for name, fn, ax in (("banded_epoch_body_coo", run_b_coo, aux_b_coo),
                         ("banded_epoch_body_csr", run_b_csr, aux_b_csr)):
        t = slope_time(lambda it, fn=fn, ax=ax:
                       (lambda: fn(state_b, bb_band, ax, iters=it)))
        res[name + "_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
    res["banded_nnzb"] = int(bsr_band.nnzb)
    res["cora6_nnzb"] = int(bsr.nnzb)
    res["banded_csr_vs_coo_device_epoch"] = round(
        res["banded_epoch_body_coo_ms"] / res["banded_epoch_body_csr_ms"], 3)
    print("banded_csr_vs_coo_device_epoch:",
          res["banded_csr_vs_coo_device_epoch"])

    RESULTS.write_text(json.dumps(res, indent=2) + "\n")
    print(f"wrote {RESULTS}")


if __name__ == "__main__":
    main()
