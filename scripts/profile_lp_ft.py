"""On-chip cost breakdown of the LP fine-tune train step.

Times embed / mining / score+grad separately with slope_time.
Run: python scripts/profile_lp_ft.py CiteSeer_LP
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.loaders import create_finetune_arrays
from gnn_pretraining_tpu.finetune.finetune import (
    _init_finetune_model, create_finetune_optimizer)
from gnn_pretraining_tpu.finetune.mining import (
    build_forbidden_mask, candidate_count, hard_count, mine_hard_negatives)
from gnn_pretraining_tpu.finetune.runners import _graph_dict, _lp_fns, _lp_stack
from gnn_pretraining_tpu.ops.sddmm import cosine_similarity_matrix
from gnn_pretraining_tpu.ops.spmm import build_dense_adjacency
from gnn_pretraining_tpu.utils.profiling import slope_time
from gnn_pretraining_tpu.utils.runtime import setup_jax

setup_jax()
domain = sys.argv[1] if len(sys.argv) > 1 else "CiteSeer_LP"
cfg = config.FinetuneConfig(domain_name=domain,
                            finetune_strategy="full_finetune",
                            pretrained_scheme="b1", seed=42)
data = {s: create_finetune_arrays(domain, s, cfg.batch_size)
        for s in ("val", "test", "train")}
model, variables = _init_finetune_model(cfg, data, "pallas", cfg.seed)
optimizer, labels, lrs = create_finetune_optimizer(variables["params"], cfg)
opt_state = optimizer.init(variables["params"])

g = data["train"].graph
train_edges = data["train"].train_edges
adj = build_dense_adjacency(jnp.asarray(g.senders), jnp.asarray(g.receivers),
                            jnp.asarray(g.edge_mask), g.num_nodes,
                            dtype=jnp.bfloat16)
forbidden = jnp.asarray(build_forbidden_mask(g.num_nodes, train_edges))
num_hard = hard_count(candidate_count(g.num_nodes, train_edges),
                      cfg.batch_size)
aux = jax.device_put({"graph": _graph_dict(g), "adj": adj,
                      "forbidden": forbidden})
train_one, eval_one = _lp_fns(model, cfg, optimizer, labels, num_hard)
train_stack = jax.device_put(_lp_stack(data["train"], "train"))
b0 = jax.tree.map(lambda a: a[0], train_stack)
state = jax.device_put((variables["params"], variables["batch_stats"],
                        opt_state))
params, stats = state[0], state[1]
print("backend:", jax.default_backend(), "N:", g.num_nodes,
      "num_hard:", num_hard, flush=True)

emb0 = model.apply({"params": params, "batch_stats": stats},
                   aux["graph"]["x"], aux["graph"]["node_mask"], False,
                   method=type(model).embed, adj=aux["adj"],
                   senders=aux["graph"]["senders"],
                   receivers=aux["graph"]["receivers"],
                   edge_mask=aux["graph"]["edge_mask"])
emb0 = jax.device_put(emb0)


def t_embed():
    def make_run(iters):
        @jax.jit
        def run(p, s, ax, key):
            def body(i, acc):
                out = model.apply(
                    {"params": p, "batch_stats": s}, ax["graph"]["x"],
                    ax["graph"]["node_mask"], False, method=type(model).embed,
                    adj=ax["adj"], senders=ax["graph"]["senders"],
                    receivers=ax["graph"]["receivers"],
                    edge_mask=ax["graph"]["edge_mask"])
                return acc + out.sum() + jax.random.fold_in(key, i)[0] * 0.0
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return lambda: run(params, stats, aux, jax.random.PRNGKey(0))
    return slope_time(make_run, n1=3, n2=15, reps=2)


def t_sim():
    def make_run(iters):
        @jax.jit
        def run(e):
            def body(i, acc):
                return acc + cosine_similarity_matrix(e + acc * 0).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return lambda: run(emb0)
    return slope_time(make_run, n1=3, n2=15, reps=2)


def t_mine():
    def make_run(iters):
        @jax.jit
        def run(e, forb, key):
            def body(i, acc):
                s, r = mine_hard_negatives(e + acc * 0, forb,
                                           jax.random.fold_in(key, i),
                                           num_negatives=256,
                                           num_hard=num_hard)
                return acc + s.sum().astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return lambda: run(emb0, aux["forbidden"], jax.random.PRNGKey(0))
    return slope_time(make_run, n1=3, n2=15, reps=2)


def t_full():
    def make_run(iters):
        @jax.jit
        def run(st, b, ax, key):
            def body(i, carry):
                st2, acc = carry
                st3, logs = train_one(st2, b, ax, jax.random.fold_in(key, i))
                return st3, acc + logs[0]
            _, acc = jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0.0)))
            return acc
        return lambda: run(state, b0, aux, jax.random.PRNGKey(0))
    return slope_time(make_run, n1=3, n2=15, reps=2)


print(f"  embed fwd      : {t_embed()*1e3:8.2f} ms", flush=True)
print(f"  cosine sim NxN : {t_sim()*1e3:8.2f} ms", flush=True)
print(f"  full mining    : {t_mine()*1e3:8.2f} ms", flush=True)
print(f"  full train step: {t_full()*1e3:8.2f} ms", flush=True)
