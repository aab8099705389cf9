"""Probe the fused LP fine-tune NaN on TPU: run individual train steps
with intermediate diagnostics (no scan), printing where NaN first appears."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.loaders import create_finetune_arrays
from gnn_pretraining_tpu.finetune.finetune import (
    _init_finetune_model, create_finetune_optimizer, param_counts)
from gnn_pretraining_tpu.finetune.mining import (
    build_forbidden_mask, candidate_count, hard_count, mine_hard_negatives)
from gnn_pretraining_tpu.finetune.runners import (
    _graph_dict, _key_for, _lp_fns, _lp_stack)
from gnn_pretraining_tpu.ops.spmm import build_dense_adjacency

domain = sys.argv[1] if len(sys.argv) > 1 else "CiteSeer_LP"
agg = sys.argv[2] if len(sys.argv) > 2 else "pallas"
nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

print("backend:", jax.default_backend(), flush=True)
cfg = config.FinetuneConfig(domain_name=domain,
                            finetune_strategy="full_finetune",
                            pretrained_scheme="b1", seed=42)
data = {s: create_finetune_arrays(domain, s, cfg.batch_size)
        for s in ("val", "test", "train")}
model, variables = _init_finetune_model(cfg, data, agg, cfg.seed)
optimizer, labels, lrs = create_finetune_optimizer(variables["params"], cfg)
opt_state = optimizer.init(variables["params"])

adj_dtype = jnp.bfloat16 if agg == "pallas" else jnp.float32
g = data["train"].graph
train_edges = data["train"].train_edges
adj = build_dense_adjacency(jnp.asarray(g.senders), jnp.asarray(g.receivers),
                            jnp.asarray(g.edge_mask), g.num_nodes,
                            dtype=adj_dtype)
forbidden = jnp.asarray(build_forbidden_mask(g.num_nodes, train_edges))
num_hard = hard_count(candidate_count(g.num_nodes, train_edges),
                      cfg.batch_size)
train_one, eval_one = _lp_fns(model, cfg, optimizer, labels, num_hard)
aux = {"graph": _graph_dict(g), "adj": adj, "forbidden": forbidden}
train_stack = _lp_stack(data["train"], "train")

state = (variables["params"], variables["batch_stats"], opt_state)
state = jax.device_put(state)
aux = jax.device_put(aux)
base_key = jax.random.PRNGKey(cfg.seed + 7919)


def nan_report(tree, name):
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad.append((jax.tree_util.keystr(path),
                        int((~np.isfinite(a)).sum()), a.size))
    if bad:
        print(f"  !! {name}: {bad[:6]}", flush=True)
    return bool(bad)


jit_train = jax.jit(train_one)
steps = jax.tree.leaves(train_stack)[0].shape[0]
print(f"steps/epoch={steps} num_hard={num_hard} N={g.num_nodes}", flush=True)

t0 = time.time()
for e in range(3):
    for s in range(min(steps, nsteps)):
        b = jax.tree.map(lambda a, s=s: a[s], train_stack)
        key = _key_for(base_key, e, s)
        state, logs = jit_train(state, b, aux, key)
        loss = float(logs[0])
        print(f"e{e} s{s} loss={loss:.6f} ({time.time()-t0:.1f}s)", flush=True)
        if not np.isfinite(loss):
            print("NaN hit — probing intermediates", flush=True)
            params, stats, _ = state
            nan_report(params, "params")
            nan_report(stats, "batch_stats")
            # re-run the embed path on the pre-step state to find source
            sys.exit(1)
print("no NaN in probed steps", flush=True)
