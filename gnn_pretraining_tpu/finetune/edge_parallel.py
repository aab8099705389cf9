"""Edge-partitioned fine-tuning steps for full-graph task types.

Node-classification and link-prediction fine-tuning run one whole-graph
forward per step (reference finetune.py:162-205) — the scaling axis is the
edge count (SURVEY.md §5). These step builders mirror finetune.py's
``make_nc_steps`` / ``make_lp_steps`` with the graph's COO edge list sharded
over the ``edge`` mesh axis:

  * every aggregation computes a local partial over the device's edges and
    psum-combines (models' ``edge_axis`` path);
  * node arrays, parameters and optimizer state stay replicated; BN statistics
    are computed over the (replicated) node set, so no cross-device sync is
    needed; dropout uses the same key on every device, keeping activations
    bit-identical;
  * gradients of the replicated loss are ``pmean``'d (shard_map's
    transpose(psum)=psum makes per-device grads n_dev × their local share),
    then the replicated AdamW update keeps parameters in lockstep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.finetune.mining import mine_hard_negatives
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.parallel.edge_partition import shard_edges


def _replicated_update(optimizer, labels, params, opt_state, grads):
    import optax

    from gnn_pretraining_tpu.finetune.finetune import _masked_grad_norm

    grads = jax.lax.pmean(grads, "edge")
    gnorm = _masked_grad_norm(grads, labels)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, gnorm


def make_nc_steps_edge_parallel(model: FinetuneGNN, cfg, optimizer, labels,
                                graph, mesh: Mesh, n_dev: int):
    """Edge-partitioned variants of make_nc_steps (model built with
    aggregation='coo', edge_axis='edge')."""
    from gnn_pretraining_tpu.finetune.finetune import FTState

    c = config.NUM_CLASSES[cfg.domain_name]
    binary = c == 2
    s_sh, r_sh, m_sh = shard_edges(np.asarray(graph.senders),
                                   np.asarray(graph.receivers),
                                   np.asarray(graph.edge_mask), n_dev)
    s_sh, r_sh, m_sh = jnp.asarray(s_sh), jnp.asarray(r_sh), jnp.asarray(m_sh)
    x = jnp.asarray(graph.x)
    node_mask = jnp.asarray(graph.node_mask)

    def forward(params, stats, s_loc, r_loc, m_loc, train, rng):
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(senders=s_loc, receivers=r_loc, edge_mask=m_loc)
        if train:
            return model.apply(variables, x, node_mask, True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, x, node_mask, False, **kwargs), \
            {"batch_stats": stats}

    def loss_from_logits(logits, node_idx, y):
        sel = logits[node_idx]
        if binary:
            z = sel[:, 1]
            yf = y.astype(jnp.float32)
            per = jnp.maximum(z, 0) - z * yf + jnp.log1p(jnp.exp(-jnp.abs(z)))
        else:
            logp = jax.nn.log_softmax(sel, axis=-1)
            per = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                       axis=1)[:, 0]
        return jnp.mean(per), sel

    def _train_local(state, node_idx, y, rng, s_loc, r_loc, m_loc):
        def loss_fn(p):
            logits, mut = forward(p, state.batch_stats, s_loc, r_loc, m_loc,
                                  True, rng)
            loss, sel = loss_from_logits(logits, node_idx, y)
            return loss, (sel, mut["batch_stats"])

        (loss, (sel, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state, gnorm = _replicated_update(
            optimizer, labels, state.params, state.opt_state, grads)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return FTState(params, stats, opt_state), loss, y, preds, probs, gnorm

    def _eval_local(state, node_idx, y, s_loc, r_loc, m_loc):
        logits, _ = forward(state.params, state.batch_stats, s_loc, r_loc,
                            m_loc, False, None)
        loss, sel = loss_from_logits(logits, node_idx, y)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return loss, y, preds, probs

    train_sm = shard_map(
        _train_local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("edge"), P("edge"), P("edge")),
        out_specs=P(), check_vma=False)
    eval_sm = shard_map(
        _eval_local, mesh=mesh,
        in_specs=(P(), P(), P(), P("edge"), P("edge"), P("edge")),
        out_specs=P(), check_vma=False)

    @jax.jit
    def train_step(state, node_idx, y, rng):
        return train_sm(state, node_idx, y, rng, s_sh, r_sh, m_sh)

    @jax.jit
    def eval_step(state, node_idx, y):
        return eval_sm(state, node_idx, y, s_sh, r_sh, m_sh)

    return train_step, eval_step


def make_lp_steps_edge_parallel(model: FinetuneGNN, cfg, optimizer, labels,
                                graph, mesh: Mesh, n_dev: int,
                                forbidden, num_hard):
    """Edge-partitioned variants of make_lp_steps: message passing over the
    sharded train edges; mining and scoring replicated."""
    from gnn_pretraining_tpu.finetune.finetune import FTState
    from gnn_pretraining_tpu.utils.losses import masked_bce_with_logits_mean

    s_sh, r_sh, m_sh = shard_edges(np.asarray(graph.senders),
                                   np.asarray(graph.receivers),
                                   np.asarray(graph.edge_mask), n_dev)
    s_sh, r_sh, m_sh = jnp.asarray(s_sh), jnp.asarray(r_sh), jnp.asarray(m_sh)
    x = jnp.asarray(graph.x)
    node_mask = jnp.asarray(graph.node_mask)

    def embed(params, stats, s_loc, r_loc, m_loc, train, rng):
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(senders=s_loc, receivers=r_loc, edge_mask=m_loc)
        if train:
            out, mut = model.apply(variables, x, node_mask, True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": rng},
                                   method=FinetuneGNN.embed, **kwargs)
            return out, mut["batch_stats"]
        out = model.apply(variables, x, node_mask, False,
                          method=FinetuneGNN.embed, **kwargs)
        return out, stats

    def score(params, stats, s_loc, r_loc, m_loc, ss, rr, train, rng):
        """Returns LP *logits* (loss uses stable BCE-with-logits)."""
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(senders=s_loc, receivers=r_loc, edge_mask=m_loc,
                      score_senders=ss, score_receivers=rr,
                      return_logits=True)
        if train:
            return model.apply(variables, x, node_mask, True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, x, node_mask, False, **kwargs), \
            {"batch_stats": stats}

    def _train_local(state, pos_edges, edge_mask_b, rng, s_loc, r_loc, m_loc):
        b = pos_edges.shape[1]
        k_emb, k_mine, k_drop = jax.random.split(rng, 3)
        emb, stats = embed(state.params, state.batch_stats, s_loc, r_loc,
                           m_loc, True, k_emb)
        emb = jax.lax.stop_gradient(emb)
        neg_s, neg_r = mine_hard_negatives(emb, forbidden, k_mine,
                                           num_negatives=b, num_hard=num_hard)
        ss = jnp.concatenate([pos_edges[0], neg_s])
        rr = jnp.concatenate([pos_edges[1], neg_r])
        y = jnp.concatenate([jnp.ones(b), jnp.zeros(b)])
        mask = jnp.concatenate([edge_mask_b, edge_mask_b])

        def loss_fn(p):
            z, mut = score(p, stats, s_loc, r_loc, m_loc, ss, rr, True,
                           k_drop)
            loss = masked_bce_with_logits_mean(z, y, mask)
            return loss, (jax.nn.sigmoid(z), mut["batch_stats"])

        (loss, (probs, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state, gnorm = _replicated_update(
            optimizer, labels, state.params, state.opt_state, grads)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return (FTState(params, stats2, opt_state), loss,
                y.astype(jnp.int32), preds, probs2, mask, gnorm)

    def _eval_local(state, edges, y, edge_mask_b, s_loc, r_loc, m_loc):
        z, _ = score(state.params, state.batch_stats, s_loc, r_loc, m_loc,
                     edges[0], edges[1], False, None)
        probs = jax.nn.sigmoid(z)
        loss = masked_bce_with_logits_mean(z, y, edge_mask_b)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return loss, y.astype(jnp.int32), preds, probs2

    train_sm = shard_map(
        _train_local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("edge"), P("edge"), P("edge")),
        out_specs=P(), check_vma=False)
    eval_sm = shard_map(
        _eval_local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("edge"), P("edge"), P("edge")),
        out_specs=P(), check_vma=False)

    @jax.jit
    def train_step(state, pos_edges, edge_mask_b, rng):
        return train_sm(state, pos_edges, edge_mask_b, rng, s_sh, r_sh, m_sh)

    @jax.jit
    def eval_step(state, edges, y, edge_mask_b):
        return eval_sm(state, edges, y, edge_mask_b, s_sh, r_sh, m_sh)

    return train_step, eval_step
