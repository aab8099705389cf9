"""Data-parallel graph-classification fine-tuning.

Each padded batch's graphs are split round-robin across the ``data`` mesh
axis. Exact single-device semantics: the masked-mean loss psums its sum and
count, BatchNorm runs synced over the axis (global-batch statistics), dropout
keys fold in the device index (independent rows, as on one chip), and pmean'd
gradients drive a replicated AdamW update. Per-graph outputs come back
stacked per device for the host-side sklearn metrics.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.batch import GraphBatch, GraphStore, build_batch, round_up
from gnn_pretraining_tpu.ops.segment import segment_mean


def build_sharded_gc_batches(store: GraphStore, split: str, batch_size: int,
                             n_dev: int) -> List[GraphBatch]:
    """Unshuffled split batches, each as n_dev stacked sub-batches."""
    idx = np.asarray(store.splits[split], np.int64)
    nn = np.diff(store.node_offsets)
    ne = np.diff(store.edge_offsets)
    g_local = max(1, -(-batch_size // n_dev))

    # shared per-device pads over all (batch, device) chunks
    max_n = max_e = 1
    chunks = []
    for i in range(0, len(idx), batch_size):
        batch_idx = idx[i:i + batch_size]
        per_dev = [batch_idx[d::n_dev] for d in range(n_dev)]
        chunks.append(per_dev)
        for sel in per_dev:
            if len(sel):
                max_n = max(max_n, int(nn[sel].sum()))
                max_e = max(max_e, int(ne[sel].sum()))
    n_pad, e_pad = round_up(max_n), round_up(max_e)

    out = []
    for per_dev in chunks:
        subs = [build_batch(store, sel, n_pad, e_pad, g_local)
                for sel in per_dev]
        out.append(jax.tree.map(lambda *xs: np.stack(xs), *subs))
    return out


def make_gc_steps_data_parallel(model, cfg, optimizer, labels, mesh: Mesh):
    """DP variants of make_gc_steps (model built with axis_name='data')."""
    from gnn_pretraining_tpu.finetune.finetune import (
        FTState,
        _masked_grad_norm,
    )

    c = config.NUM_CLASSES[cfg.domain_name]
    binary = c == 2

    def forward(params, stats, batch, train, rng):
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(senders=batch.senders, receivers=batch.receivers,
                      edge_mask=batch.edge_mask, node_graph=batch.node_graph,
                      num_graphs=batch.num_graphs)
        if train:
            return model.apply(variables, batch.x, batch.node_mask, True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, batch.x, batch.node_mask, False,
                           **kwargs), {"batch_stats": stats}

    def loss_from_logits(logits, y, mask):
        if binary:
            z = logits[:, 1]
            yf = y.astype(jnp.float32)
            per = jnp.maximum(z, 0) - z * yf + jnp.log1p(jnp.exp(-jnp.abs(z)))
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                       axis=1)[:, 0]
        loss_sum = jax.lax.psum(jnp.sum(per * mask), "data")
        count = jax.lax.psum(jnp.sum(mask), "data")
        return loss_sum / jnp.maximum(count, 1.0)

    def _train_local(state, batch, rng):
        batch = jax.tree.map(lambda v: v[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(p):
            logits, mut = forward(p, state.batch_stats, batch, True, rng)
            loss = loss_from_logits(logits, batch.y, batch.graph_mask)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "data")
        gnorm = _masked_grad_norm(grads, labels)
        import optax

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return (FTState(params, stats, opt_state), loss,
                batch.y[None], preds[None], probs[None],
                batch.graph_mask[None], gnorm)

    def _eval_local(state, batch):
        batch = jax.tree.map(lambda v: v[0], batch)
        logits, _ = forward(state.params, state.batch_stats, batch, False, None)
        loss = loss_from_logits(logits, batch.y, batch.graph_mask)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return (loss, batch.y[None], preds[None], probs[None],
                batch.graph_mask[None])

    train_sm = jax.jit(shard_map(
        _train_local, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P()),
        check_vma=False))
    eval_sm = jax.jit(shard_map(
        _eval_local, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        check_vma=False))

    def train_step(state, stacked_batch, rng):
        state, loss, y, preds, probs, mask, gnorm = train_sm(
            state, stacked_batch, rng)
        return (state, loss, y.reshape(-1), preds.reshape(-1),
                probs.reshape(-1, probs.shape[-1]), mask.reshape(-1), gnorm)

    def eval_step(state, stacked_batch):
        loss, y, preds, probs, mask = eval_sm(state, stacked_batch)
        return (loss, y.reshape(-1), preds.reshape(-1),
                probs.reshape(-1, probs.shape[-1]), mask.reshape(-1))

    return train_step, eval_step
