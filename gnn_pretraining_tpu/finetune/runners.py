"""Scan-fused fine-tuning runners: whole epochs per device dispatch.

The reference fine-tune loop (src/finetune/finetune.py:292-339) dispatches one
CUDA step per batch and reads metrics synchronously — cheap on a local GPU,
catastrophic through the TPU relay (~0.2s per round-trip × up to 300 epochs ×
33 batches). Here the split's batches are stacked ONCE into device-resident
arrays and an E-epoch *chunk* — train scan over batches, then eval scan over
the val batches — runs as a single XLA program per dispatch. Per-epoch /
per-batch targets, predictions and probabilities come back in one bundled
fetch, and the host computes the exact sklearn metric set of the reference
(finetune/metrics.py) from them, so metric parity is untouched.

Model selection and early stopping run on the host with reference semantics
(best val accuracy/"auc", patience = epochs/2, finetune.py:269-283,412-413).
Because epoch k's logged metrics depend only on epochs ≤ k, training a few
epochs past the reference's stopping point inside the final chunk changes
nothing that is logged or selected. The best checkpoint is materialized by a
deterministic REPLAY: training is re-run from the initial state with updates
masked beyond the best epoch (same base PRNG key, keys derived by
fold_in(epoch, step) — not a split chain — so replay is bit-exact), which
reproduces exactly the parameters and BN statistics the reference would have
saved at its improvement checkpoints.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.loaders import (
    GraphClassificationData,
    LinkPredictionData,
    NodeClassificationData,
)
from gnn_pretraining_tpu.finetune import metrics as M
from gnn_pretraining_tpu.finetune.mining import mine_hard_negatives
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.ops.spmm import build_dense_adjacency
from gnn_pretraining_tpu.utils.checkpoint import save_checkpoint
from gnn_pretraining_tpu.utils.losses import (
    bce_with_logits,
    masked_bce_with_logits_mean,
)


def _key_for(base_key, epoch_idx, step_idx):
    """Per-(epoch, step) key by folding — replayable without a split chain."""
    return jax.random.fold_in(jax.random.fold_in(base_key, epoch_idx),
                              step_idx)


def _masked_update(active, new_state, old_state):
    return jax.tree.map(lambda n, o: jnp.where(active, n, o),
                        new_state, old_state)


def _ce_or_bce(logits, y, mask, binary):
    # Binary GC/NC matches the reference's un-clamped
    # F.binary_cross_entropy_with_logits (finetune.py:153); the -100 clamp
    # applies only to the LP BCE-on-probs paths.
    if binary:
        per = bce_with_logits(logits[:, 1], y, clamp=False)
    else:
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                   axis=1)[:, 0]
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _masked_grad_norm(grads, labels):
    leaves = jax.tree.leaves(
        jax.tree.map(lambda g, l: jnp.where(l != "frozen",
                                            jnp.sum(g.astype(jnp.float32) ** 2),
                                            0.0),
                     grads, labels))
    return jnp.sqrt(sum(leaves))


def _stack(arrs):
    return jnp.asarray(np.stack(arrs))


# ---------------------------------------------------------------------------
# Per-task-type step functions. Each returns
#   train_one(state, batch, aux, key)   -> (state, logs)
#   eval_one(state, batch, aux)         -> logs
# where logs = (loss, y, preds, probs, valid_mask, gnorm?) with fixed shapes.
# ---------------------------------------------------------------------------


def _gc_fns(model: FinetuneGNN, cfg, optimizer, labels):
    binary = config.NUM_CLASSES[cfg.domain_name] == 2
    adj_dtype = (jnp.bfloat16 if model.aggregation == "pallas"
                 else jnp.float32)

    def forward(params, stats, b, train, rng):
        variables = {"params": params, "batch_stats": stats}
        adj = build_dense_adjacency(b["senders"], b["receivers"],
                                    b["edge_mask"], b["x"].shape[0],
                                    dtype=adj_dtype)
        kwargs = dict(adj=adj, senders=b["senders"], receivers=b["receivers"],
                      edge_mask=b["edge_mask"], node_graph=b["node_graph"],
                      num_graphs=b["y"].shape[0])
        if train:
            return model.apply(variables, b["x"], b["node_mask"], True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, b["x"], b["node_mask"], False,
                           **kwargs), {"batch_stats": stats}

    def train_one(state, b, aux, key):
        params, stats, opt_state = state

        def loss_fn(p):
            logits, mut = forward(p, stats, b, True, key)
            loss = _ce_or_bce(logits, b["y"], b["graph_mask"], binary)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = _masked_grad_norm(grads, labels)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return ((params2, stats2, opt_state2),
                (loss, b["y"], preds, probs, b["graph_mask"], gnorm))

    def eval_one(state, b, aux):
        params, stats, _ = state
        logits, _ = forward(params, stats, b, False, None)
        loss = _ce_or_bce(logits, b["y"], b["graph_mask"], binary)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return (loss, b["y"], preds, probs, b["graph_mask"])

    return train_one, eval_one


def _nc_fns(model: FinetuneGNN, cfg, optimizer, labels):
    binary = config.NUM_CLASSES[cfg.domain_name] == 2

    def forward(params, stats, aux, train, rng):
        g = aux["graph"]
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(adj=aux.get("adj"), bsr=aux.get("bsr"),
                      senders=g["senders"], receivers=g["receivers"],
                      edge_mask=g["edge_mask"])
        if train:
            return model.apply(variables, g["x"], g["node_mask"], True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, g["x"], g["node_mask"], False,
                           **kwargs), {"batch_stats": stats}

    def _sel_loss(logits, b):
        sel = logits[b["idx"]]
        loss = _ce_or_bce(sel, b["y"], b["mask"], binary)
        return loss, sel

    def train_one(state, b, aux, key):
        params, stats, opt_state = state

        def loss_fn(p):
            logits, mut = forward(p, stats, aux, True, key)
            loss, sel = _sel_loss(logits, b)
            return loss, (sel, mut["batch_stats"])

        (loss, (sel, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = _masked_grad_norm(grads, labels)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return ((params2, stats2, opt_state2),
                (loss, b["y"], preds, probs, b["mask"], gnorm))

    def eval_one(state, b, aux):
        params, stats, _ = state
        logits, _ = forward(params, stats, aux, False, None)
        loss, sel = _sel_loss(logits, b)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return (loss, b["y"], preds, probs, b["mask"])

    return train_one, eval_one


def _lp_fns(model: FinetuneGNN, cfg, optimizer, labels, num_hard):
    def embed(params, stats, aux, train, rng):
        g = aux["graph"]
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(adj=aux.get("adj"), bsr=aux.get("bsr"),
                      senders=g["senders"], receivers=g["receivers"],
                      edge_mask=g["edge_mask"])
        if train:
            out, mut = model.apply(variables, g["x"], g["node_mask"], True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": rng},
                                   method=FinetuneGNN.embed, **kwargs)
            return out, mut["batch_stats"]
        out = model.apply(variables, g["x"], g["node_mask"], False,
                          method=FinetuneGNN.embed, **kwargs)
        return out, stats

    def score(params, stats, aux, s, r, train, rng):
        """Returns LP *logits* (loss uses the stable BCE-with-logits form)."""
        g = aux["graph"]
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(adj=aux.get("adj"), bsr=aux.get("bsr"),
                      senders=g["senders"], receivers=g["receivers"],
                      edge_mask=g["edge_mask"],
                      score_senders=s, score_receivers=r, return_logits=True)
        if train:
            return model.apply(variables, g["x"], g["node_mask"], True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, g["x"], g["node_mask"], False,
                           **kwargs), {"batch_stats": stats}

    def train_one(state, b, aux, key):
        params, stats, opt_state = state
        pos, edge_mask = b["edges"], b["mask"]
        n = pos.shape[1]
        k_emb, k_mine, k_drop = jax.random.split(key, 3)
        # No-grad embedding in train mode: BN stats update, dropout active
        # (reference finetune.py:186-188 under model.train()).
        emb, stats = embed(params, stats, aux, True, k_emb)
        emb = jax.lax.stop_gradient(emb)
        neg_s, neg_r = mine_hard_negatives(emb, aux["forbidden"], k_mine,
                                           num_negatives=n, num_hard=num_hard)
        s = jnp.concatenate([pos[0], neg_s])
        r = jnp.concatenate([pos[1], neg_r])
        y = jnp.concatenate([jnp.ones(n), jnp.zeros(n)])
        mask = jnp.concatenate([edge_mask, edge_mask])

        def loss_fn(p):
            z, mut = score(p, stats, aux, s, r, True, k_drop)
            loss = masked_bce_with_logits_mean(z, y, mask)
            return loss, (jax.nn.sigmoid(z), mut["batch_stats"])

        (loss, (probs, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = _masked_grad_norm(grads, labels)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return ((params2, stats2, opt_state2),
                (loss, y.astype(jnp.int32), preds, probs2, mask, gnorm))

    def eval_one(state, b, aux):
        params, stats, _ = state
        z, _ = score(params, stats, aux, b["edges"][0], b["edges"][1],
                     False, None)
        probs = jax.nn.sigmoid(z)
        loss = masked_bce_with_logits_mean(z, b["y"], b["mask"])
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return (loss, b["y"].astype(jnp.int32), preds, probs2, b["mask"])

    return train_one, eval_one


# ---------------------------------------------------------------------------
# Stacked split data
# ---------------------------------------------------------------------------


def _gc_stack(data: GraphClassificationData):
    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                        *[{"x": b.x, "senders": b.senders,
                           "receivers": b.receivers, "edge_mask": b.edge_mask,
                           "node_mask": b.node_mask,
                           "node_graph": b.node_graph, "y": b.y,
                           "graph_mask": b.graph_mask}
                          for b in data.batches])


def _nc_stack(data: NodeClassificationData, remap=None):
    sizes = [len(ix) for ix in data.node_indices]
    b = max(sizes)
    idx = np.zeros((len(sizes), b), np.int32)
    ys = np.zeros((len(sizes), b), np.int32)
    mask = np.zeros((len(sizes), b), np.float32)
    for i, (ix, y) in enumerate(zip(data.node_indices, data.labels)):
        idx[i, :len(ix)] = remap[ix] if remap is not None else ix
        ys[i, :len(y)] = y
        mask[i, :len(ix)] = 1.0
    return {"idx": jnp.asarray(idx), "y": jnp.asarray(ys),
            "mask": jnp.asarray(mask)}


def _lp_stack(data: LinkPredictionData, split: str, remap=None):
    edges = _stack(data.edges)
    if remap is not None:
        edges = jnp.asarray(remap)[edges]
    if split == "train":
        return {"edges": edges, "mask": _stack(data.edge_mask)}
    return {"edges": edges, "y": _stack(data.labels),
            "mask": _stack(data.edge_mask)}


def _graph_dict(g):
    return {"x": jnp.asarray(g.x), "senders": jnp.asarray(g.senders),
            "receivers": jnp.asarray(g.receivers),
            "edge_mask": jnp.asarray(g.edge_mask),
            "node_mask": jnp.asarray(g.node_mask)}


def _csr_graph_aux(g):
    """RCM-reorder the domain graph and build its BlockCSR host-side
    (VERDICT r3 #3: loader-side BSR + rcm_order, then the loop just passes
    tiles to the model). Returns the permuted graph dict, the BlockCSR over
    the permuted edges, and ``inv`` (old node id → new node id) for remapping
    split node indices / scoring edges.

    The permutation relabels nodes so edges concentrate near the diagonal —
    fewer nonzero (128,128) tiles, less HBM traffic — and is exactly
    compensated by remapping every node-indexed array, so losses/metrics
    match the unpermuted run up to float reduction order."""
    from gnn_pretraining_tpu.ops.spmm_csr import build_block_csr, rcm_order

    sen = np.asarray(g.senders)
    rec = np.asarray(g.receivers)
    em = np.asarray(g.edge_mask, np.float32)
    n = int(np.asarray(g.node_mask).shape[0])
    valid = em != 0
    perm = rcm_order(sen[valid], rec[valid], n)  # perm[new] = old
    inv = np.argsort(perm).astype(np.int32)     # inv[old] = new
    sen2, rec2 = inv[sen], inv[rec]
    gd = {"x": jnp.asarray(np.asarray(g.x)[perm]),
          "senders": jnp.asarray(sen2), "receivers": jnp.asarray(rec2),
          "edge_mask": jnp.asarray(em),
          "node_mask": jnp.asarray(np.asarray(g.node_mask)[perm])}
    bsr = build_block_csr(sen2, rec2, em, n)
    return gd, bsr, inv


# ---------------------------------------------------------------------------
# The fused loop
# ---------------------------------------------------------------------------



def _pack_logs(logs, spec_out: list):
    """Flatten a stacked log pytree into ONE f32 array (same leading dim).

    The axon relay charges one RPC (~0.35-0.5 s) PER FETCHED LEAF; a chunk's
    11-13 log leaves made the per-epoch wall ~0.3 s while the actual device
    work is ~25 ms (analysis/results/nc16k_probe.json). One packed array =
    one RPC — the same fix the pretrain loop's packed metric array uses.
    Int leaves (labels/preds, values << 2^24) cast to f32 exactly;
    ``spec_out`` receives (treedef, [(shape, dtype)...]) at trace time for
    the host-side unpack."""
    leaves, treedef = jax.tree.flatten(logs)
    if not spec_out:
        spec_out.append((treedef,
                         [(tuple(l.shape), np.dtype(l.dtype))
                          for l in leaves]))
    lead = leaves[0].shape[0]
    return jnp.concatenate(
        [l.astype(jnp.float32).reshape(lead, -1) for l in leaves], axis=1)


def _unpack_logs(packed, spec):
    treedef, shapes = spec
    packed = np.asarray(packed)
    out, off = [], 0
    for shape, dtype in shapes:
        size = int(np.prod(shape[1:], dtype=np.int64))
        out.append(packed[:, off:off + size].reshape(shape).astype(dtype))
        off += size
    return jax.tree.unflatten(treedef, out)


def run_finetune_fused(cfg, data, model, state0, optimizer, labels, lrs,
                       aggregation: str, epochs: int, patience: int,
                       logger, ckpt_path, training_start: float,
                       total_params: int, trainable_params: int,
                       chunk_epochs: int = 32) -> Dict[str, float]:
    """Pass-1 metrics sweep + host selection + pass-2 replay + test pass.

    ``state0`` is the (params, batch_stats, opt_state) tuple at initialization
    (after any pretrained-weight transfer).
    """
    task = cfg.task_type
    adj_dtype = jnp.bfloat16 if aggregation == "pallas" else jnp.float32
    if aggregation == "csr" and task == "graph_classification":
        raise ValueError(
            "aggregation='csr' needs one fixed message-passing graph (node "
            "classification / link prediction domains); graph-classification "
            "batches change structure per step — use pallas/coo/dense there")

    if task == "graph_classification":
        train_one, eval_one = _gc_fns(model, cfg, optimizer, labels)
        train_stack = _gc_stack(data["train"])
        val_stack = _gc_stack(data["val"])
        test_stack = _gc_stack(data["test"])
        aux = {}
    elif task == "node_classification":
        train_one, eval_one = _nc_fns(model, cfg, optimizer, labels)
        g = data["train"].graph
        remap = None
        if aggregation == "csr":
            gd, bsr, remap = _csr_graph_aux(g)
            aux = {"graph": gd, "bsr": bsr}
        elif aggregation == "coo":
            # COO never reads the dense adjacency; building it anyway would
            # cost O(N²) HBM + a relay upload (1 GB at N=16k).
            aux = {"graph": _graph_dict(g)}
        else:
            adj = build_dense_adjacency(jnp.asarray(g.senders),
                                        jnp.asarray(g.receivers),
                                        jnp.asarray(g.edge_mask), g.num_nodes,
                                        dtype=adj_dtype)
            aux = {"graph": _graph_dict(g), "adj": adj}
        train_stack = _nc_stack(data["train"], remap)
        val_stack = _nc_stack(data["val"], remap)
        test_stack = _nc_stack(data["test"], remap)
    else:
        from gnn_pretraining_tpu.finetune.mining import (
            build_forbidden_mask,
            candidate_count,
            hard_count,
        )

        g = data["train"].graph
        train_edges = data["train"].train_edges
        remap = None
        if aggregation == "csr":
            gd, bsr, remap = _csr_graph_aux(g)
            aux = {"graph": gd, "bsr": bsr}
            train_edges = remap[np.asarray(train_edges)]
            node_mask = np.asarray(g.node_mask)[np.argsort(remap)]
        elif aggregation == "coo":
            aux = {"graph": _graph_dict(g)}
            node_mask = g.node_mask
        else:
            adj = build_dense_adjacency(jnp.asarray(g.senders),
                                        jnp.asarray(g.receivers),
                                        jnp.asarray(g.edge_mask), g.num_nodes,
                                        dtype=adj_dtype)
            aux = {"graph": _graph_dict(g), "adj": adj}
            node_mask = g.node_mask
        real_n = int(np.asarray(g.node_mask).sum())
        forbidden = jnp.asarray(build_forbidden_mask(g.num_nodes, train_edges,
                                                     node_mask=node_mask))
        num_hard = hard_count(candidate_count(g.num_nodes, train_edges,
                                              num_real_nodes=real_n),
                              cfg.batch_size)
        train_one, eval_one = _lp_fns(model, cfg, optimizer, labels, num_hard)
        aux["forbidden"] = forbidden
        train_stack = _lp_stack(data["train"], "train", remap)
        val_stack = _lp_stack(data["val"], "val", remap)
        test_stack = _lp_stack(data["test"], "test", remap)

    # Edges aggregated per training step (real, mask-valid), for the
    # per-cell edges_per_sec telemetry column: GC steps aggregate one padded
    # batch; NC/LP steps encode the full domain graph.
    if task == "graph_classification":
        em = np.asarray(train_stack["edge_mask"])
        edges_per_step = float(em.sum() / max(em.shape[0], 1))
    else:
        edges_per_step = float(np.asarray(g.edge_mask).sum())

    # Everything device-resident once; uploads complete before any compile.
    train_stack = jax.device_put(train_stack)
    val_stack = jax.device_put(val_stack)
    test_stack = jax.device_put(test_stack)
    aux = jax.device_put(aux)
    state0 = jax.device_put(state0)
    jax.block_until_ready((train_stack, val_stack, test_stack, aux, state0))

    steps_per_epoch = jax.tree.leaves(train_stack)[0].shape[0]
    E = int(min(chunk_epochs, epochs))
    base_key = jax.random.PRNGKey(cfg.seed + config.FINETUNE_KEY_OFFSET)

    epoch_log_spec, eval_log_spec = [], []

    def run_epochs(state, tr, va, ax, key, epoch0, limit):
        """Run E epochs from absolute epoch ``epoch0``; only the first
        ``limit`` epochs of THIS chunk apply updates (i.e. absolute epochs
        < epoch0 + limit), the rest replay evaluation on the frozen state.
        Pass 1 uses limit=E (all active); pass-2 replay uses
        limit = best_epoch - epoch0 to stop exactly at the best epoch."""
        def epoch_body(st, eidx):
            def step_body(s, xs):
                sidx, batch = xs
                s2, logs = train_one(s, batch, ax, _key_for(key, eidx, sidx))
                s2 = _masked_update(eidx < epoch0 + limit, s2, s)
                return s2, logs

            st, tlogs = jax.lax.scan(
                step_body, st, (jnp.arange(steps_per_epoch), tr))

            def eval_body(s, batch):
                return s, eval_one(s, batch, ax)

            _, vlogs = jax.lax.scan(eval_body, st, va)
            return st, (tlogs, vlogs)

        state, logs = jax.lax.scan(epoch_body, state,
                                   epoch0 + jnp.arange(E))
        return state, _pack_logs(logs, epoch_log_spec)

    run_epochs = jax.jit(run_epochs)

    def run_eval(state, stack, ax):
        def eval_body(s, batch):
            return s, eval_one(s, batch, ax)

        _, logs = jax.lax.scan(eval_body, state, stack)
        return _pack_logs(logs, eval_log_spec)

    run_eval = jax.jit(run_eval)

    # ---- pass 1: metrics sweep with host-side selection ------------------
    sel_key = "val/auc" if task == "link_prediction" else "val/accuracy"
    best_val = -float("inf")
    best_epoch = 0
    esi = 0  # epochs_since_improvement
    stop_epoch = epochs
    global_step = 0
    state = state0
    stopped = False
    epoch = 0

    def batch_rows(logs, split):
        """Per-batch host metrics from stacked (loss,y,preds,probs,mask)."""
        loss, y, preds, probs, mask = [np.asarray(a) for a in logs]
        rows = []
        for j in range(loss.shape[0]):
            valid = mask[j] > 0
            rows.append(M.compute_batch_metrics(
                cfg.domain_name, y[j][valid], preds[j][valid],
                probs[j][valid], float(loss[j]), split))
        return rows

    # One-chunk-deep pipeline: dispatch chunk k+1 (async — JAX returns device
    # futures) BEFORE host-processing chunk k's logs, so the Python/sklearn
    # metric loop below overlaps the next chunk's device execution instead of
    # serializing with it. On the LP domains (300 epochs x 33 steps of
    # per-step sklearn rows through the relay) the host loop is comparable to
    # the device time, so this nearly halves wall-clock. When early stopping
    # fires mid-pipeline the already-dispatched chunk is discarded unprocessed
    # (its metrics are never logged; pass-2 replay rebuilds exact state).
    def process_chunk(chunk_start, fetched, per_step_wall):
        nonlocal best_val, best_epoch, esi, stop_epoch, global_step, epoch
        nonlocal stopped
        tlogs, vlogs = fetched
        chunk_epochs = min(E, epochs - chunk_start)
        for e in range(chunk_epochs):
            epoch = chunk_start + e + 1
            # train rows (per step), reference namespace
            t_e = [np.asarray(a)[e] for a in tlogs]
            loss_s, y_s, preds_s, probs_s, mask_s, gnorm_s = t_e
            for sidx in range(steps_per_epoch):
                global_step += 1
                valid = mask_s[sidx] > 0
                tm = M.compute_training_metrics(
                    epoch, global_step, float(loss_s[sidx]), lrs,
                    cfg.domain_name, y_s[sidx][valid], preds_s[sidx][valid],
                    probs_s[sidx][valid], time.time() - per_step_wall,
                    float(gnorm_s[sidx]))
                logger.log(tm, step=global_step)
            v_e = [np.asarray(a)[e] for a in vlogs]
            val_bm = batch_rows(v_e, "val")
            val_metrics = M.compute_validation_metrics(val_bm, epoch)
            vy = np.concatenate([np.asarray(v_e[1])[j][np.asarray(v_e[4])[j] > 0]
                                 for j in range(len(val_bm))])
            vp = np.concatenate([np.asarray(v_e[3])[j][np.asarray(v_e[4])[j] > 0]
                                 for j in range(len(val_bm))])
            val_metrics.update(M.compute_global_auc(cfg.domain_name, vy, vp,
                                                    "val"))
            logger.log(val_metrics, step=global_step)

            if val_metrics[sel_key] > best_val:
                best_val = val_metrics[sel_key]
                best_epoch = epoch
                esi = 0
            else:
                esi += 1
            if esi >= patience:
                stop_epoch = epoch
                stopped = True
                return

    pending = None  # (chunk_start, device logs, dispatch wall time)
    chunk_states = {0: state0}  # state at the START of each chunk (on device)

    def prune_chunk_states():
        """Drop boundary states the pass-2 replay can no longer need.

        A stored boundary b serves the replay only if the final best epoch
        lands in [b, b+E). Epochs ≤ ``epoch`` are decided — of those chunks
        only the current best's boundary can still win — while any future
        best lies in a not-yet-processed chunk, whose boundary is ≥ the
        frontier. Keeping {best boundary} ∪ {b ≥ frontier} bounds device
        residency at ~3 states instead of epochs/E (VERDICT-style HBM
        hygiene for 300-epoch LP runs).
        """
        frontier = (epoch // E) * E
        keep = {(best_epoch // E) * E}
        for b in list(chunk_states):
            if b < frontier and b not in keep:
                del chunk_states[b]

    t_pass1 = time.time()
    fetched_epochs = 0  # epochs whose device work pass1_wall actually covers
    dispatch_times = []  # steady-state telemetry (see below)
    for chunk_start in range(0, epochs, E):
        t_chunk = time.time()
        dispatch_times.append(t_chunk)
        state, logs = run_epochs(state, train_stack, val_stack, aux,
                                 base_key, jnp.int32(chunk_start),
                                 jnp.int32(E))
        chunk_states[chunk_start + E] = state
        if pending is not None:
            prev_start, prev_logs, prev_t = pending
            # device_get returns when chunk k is done; chunk k+1 keeps
            # computing while the host loop below runs. ONE packed leaf =
            # one relay RPC (see _pack_logs).
            fetched = _unpack_logs(jax.device_get(prev_logs),
                                   epoch_log_spec[0])
            fetched_epochs += min(E, epochs - prev_start)
            per_step_wall = ((time.time() - prev_t)
                             / (E * max(steps_per_epoch, 1)))
            process_chunk(prev_start, fetched, per_step_wall)
            prune_chunk_states()
            if stopped:
                pending = None
                break
        pending = (chunk_start, logs, t_chunk)
    if pending is not None and not stopped:
        prev_start, prev_logs, prev_t = pending
        fetched = _unpack_logs(jax.device_get(prev_logs),
                               epoch_log_spec[0])
        fetched_epochs += min(E, epochs - prev_start)
        per_step_wall = (time.time() - prev_t) / (E * max(steps_per_epoch, 1))
        process_chunk(prev_start, fetched, per_step_wall)
    pass1_wall = time.time() - t_pass1

    # ---- pass 2: deterministic replay to the best epoch ------------------
    # Chunk-boundary states were kept on device during pass 1 (keys derive by
    # fold_in of ABSOLUTE epoch/step indices, so resuming mid-run is
    # bit-exact), so only the final partial chunk re-runs — not the whole
    # history. The masked-update replay itself is invariance-tested in
    # tests/test_fused_finetune.py.
    last_boundary = (best_epoch // E) * E  # == best_epoch when on a boundary
    state_best = chunk_states[last_boundary]
    if best_epoch > last_boundary:
        state_best, _ = run_epochs(state_best, train_stack, val_stack, aux,
                                   base_key, jnp.int32(last_boundary),
                                   jnp.int32(best_epoch - last_boundary))
    params_b, stats_b, _ = state_best
    save_checkpoint(ckpt_path, params_b, stats_b, best_epoch,
                    {sel_key: best_val})

    # ---- test pass on the best state (reference :415-433) ----------------
    test_logs = _unpack_logs(jax.device_get(
        run_eval(state_best, test_stack, aux)), eval_log_spec[0])
    test_bm = batch_rows(test_logs, "test")
    test_metrics = M.compute_test_metrics(
        test_bm, stop_epoch if stopped else epoch, esi, training_start,
        total_params, trainable_params,
        # Throughput counts every epoch whose device work pass1_wall covers
        # (whole fetched chunks), not just epochs up to the early stop —
        # an early-stopped LP cell otherwise under-reports steps/s ~1.6x.
        train_steps=fetched_epochs * steps_per_epoch, train_wall=pass1_wall,
        edges_per_step=edges_per_step)
    ty = np.concatenate([np.asarray(test_logs[1])[j][np.asarray(test_logs[4])[j] > 0]
                         for j in range(len(test_bm))])
    tp = np.concatenate([np.asarray(test_logs[3])[j][np.asarray(test_logs[4])[j] > 0]
                         for j in range(len(test_bm))])
    test_metrics.update(M.compute_global_auc(cfg.domain_name, ty, tp, "test"))
    # Steady-state throughput: the pipeline reaches steady state from the
    # third dispatch on (the 1st pays compile, the 2nd drains the cold
    # pipeline), after which the dispatch-to-dispatch period is
    # max(device chunk time, host metric loop) — what a longer run would
    # sustain. Unlike steps_per_sec (wall/steps incl. one-off compile and
    # relay warm-up), this is comparable across aggregation modes
    # (VERDICT r4 next-round #2: "steady-state per-step time excluding
    # compile from in-run telemetry").
    if len(dispatch_times) >= 3:
        periods = np.diff(dispatch_times)[1:]
        steady = float(np.sum(periods)) / (len(periods) * E
                                           * max(steps_per_epoch, 1))
        test_metrics["test/steady_steps_per_sec"] = 1.0 / max(steady, 1e-9)
        test_metrics["test/steady_edges_per_sec"] = (
            edges_per_step / max(steady, 1e-9))
    logger.log(test_metrics, step=global_step)
    return test_metrics
