"""Node-partitioned (halo-exchange) fine-tuning steps for full-graph tasks.

``finetune/edge_parallel.py`` shards only the edge list and psums a full
``[N, F]`` partial per GIN layer — exact, but the moved bytes are independent
of the partition quality. These builders shard the node rows themselves
(activations are never replicated inside the backbone) and communicate only
the halo rows via ``parallel/node_partition.halo_aggregate_local``, the
design SURVEY.md §5 calls for ("psum-scatter / all-to-all of boundary
partials, overlapping exchange with local SpMM"):

  * ``x``/``node_mask`` live in the plan's ``[n_dev * n_loc, ·]`` row layout,
    sharded over the ``edge`` mesh axis; every GIN layer's aggregation is the
    halo exchange (bytes ∝ edge cut, not N);
  * BatchNorm runs as SyncBN (``MaskedBatchNorm(axis_name='edge')``): psum of
    masked sums/counts reproduces exactly the global-batch statistics a
    single device computes (models/norm.py);
  * dropout keys are folded with the device index so sharded rows draw
    independent noise;
  * the task head runs on the device-local rows and the logits (NC) or final
    embeddings (LP) are ``all_gather``'d — both are ≤ a few MB for the
    reference's graphs — after which loss/mining/scoring semantics are the
    single-device ones verbatim (reference src/finetune/finetune.py:162-205);
  * the loss is replicated, so per-device grads are n_dev × their local
    share (transpose of all_gather = psum-scatter); ``pmean`` recovers the
    exact global gradient, and the replicated AdamW update keeps parameters
    in lockstep (same convention as edge_parallel._replicated_update).

Engaged from the production CLI via ``run_finetune.py --partition node``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.finetune.edge_parallel import _replicated_update
from gnn_pretraining_tpu.finetune.mining import mine_hard_negatives
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.models.heads import MLPLinkPredictor
from gnn_pretraining_tpu.parallel.node_partition import (
    build_node_partition_plan,
    halo_aggregate_local,
    pad_node_rows,
)


def _prepare(graph, n_dev: int):
    """Plan + row-sharded operands in the plan's [n_dev, n_loc/..., ·] layout
    (leading device axis for shard_map's P('edge') input specs)."""
    plan = build_node_partition_plan(np.asarray(graph.senders),
                                     np.asarray(graph.receivers),
                                     np.asarray(graph.edge_mask),
                                     int(np.asarray(graph.x).shape[0]), n_dev)
    x = pad_node_rows(np.asarray(graph.x), plan)
    nm = np.zeros(plan.n_dev * plan.n_loc, np.float32)
    nm[:len(np.asarray(graph.node_mask))] = np.asarray(graph.node_mask)
    x_sh = jnp.asarray(x.reshape(n_dev, plan.n_loc, -1))
    nm_sh = jnp.asarray(nm.reshape(n_dev, plan.n_loc))
    plan_sh = tuple(jnp.asarray(a) for a in (
        plan.loc_senders, plan.loc_receivers, plan.loc_mask,
        plan.halo_senders, plan.halo_receivers, plan.halo_mask,
        plan.send_idx))
    return plan, x_sh, nm_sh, plan_sh


def _local_model(domain_name: str, plan, plan_slices, n_dev: int):
    """A FinetuneGNN whose aggregation is this device's halo exchange."""
    ls, lr, lm, hs, hr, hm, send_idx = plan_slices

    def agg(h, eps):
        return halo_aggregate_local(h, eps, ls, lr, lm, hs, hr, hm, send_idx,
                                    n_dev, plan.n_loc, axis="edge")

    return FinetuneGNN(domain_name=domain_name, aggregation="coo",
                       axis_name="edge", aggregate_fn=agg)


def _fold_drop(rng):
    return jax.random.fold_in(rng, jax.lax.axis_index("edge"))


def make_nc_steps_node_parallel(cfg, optimizer, labels, graph, mesh: Mesh,
                                n_dev: int):
    """Node-partitioned variants of make_nc_steps (same call signatures)."""
    from gnn_pretraining_tpu.finetune.finetune import FTState

    c = config.NUM_CLASSES[cfg.domain_name]
    binary = c == 2
    plan, x_sh, nm_sh, plan_sh = _prepare(graph, n_dev)

    def forward(params, stats, x_loc, nm_loc, plan_slices, train, rng):
        model = _local_model(cfg.domain_name, plan, plan_slices, n_dev)
        variables = {"params": params, "batch_stats": stats}
        if train:
            return model.apply(variables, x_loc, nm_loc, True,
                               mutable=["batch_stats"],
                               rngs={"dropout": _fold_drop(rng)})
        return model.apply(variables, x_loc, nm_loc, False), \
            {"batch_stats": stats}

    def loss_from_logits(logits_loc, node_idx, y):
        logits = jax.lax.all_gather(logits_loc, "edge", axis=0, tiled=True)
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

    def _train_local(state, node_idx, y, rng, x_loc, nm_loc, *plan_slices):
        def loss_fn(p):
            logits_loc, mut = forward(p, state.batch_stats, x_loc, nm_loc,
                                      plan_slices, True, rng)
            loss, sel = loss_from_logits(logits_loc, node_idx, y)
            return loss, (sel, mut["batch_stats"])

        (loss, (sel, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state, gnorm = _replicated_update(
            optimizer, labels, state.params, state.opt_state, grads)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return FTState(params, stats, opt_state), loss, y, preds, probs, gnorm

    def _eval_local(state, node_idx, y, x_loc, nm_loc, *plan_slices):
        logits_loc, _ = forward(state.params, state.batch_stats, x_loc,
                                nm_loc, plan_slices, False, None)
        loss, sel = loss_from_logits(logits_loc, node_idx, y)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return loss, y, preds, probs

    def _strip(fn, n_lead):
        # plan slices arrive [1, ...] per device (leading shard dim); strip it
        def wrapped(*args):
            head, tail = args[:n_lead], [a[0] for a in args[n_lead:]]
            return fn(*head, *tail)
        return wrapped

    train_sm = shard_map(
        _strip(_train_local, 4), mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("edge"), P("edge")) + (P("edge"),) * 7,
        out_specs=P(), check_vma=False)
    eval_sm = shard_map(
        _strip(_eval_local, 3), mesh=mesh,
        in_specs=(P(), P(), P(), P("edge"), P("edge")) + (P("edge"),) * 7,
        out_specs=P(), check_vma=False)

    @jax.jit
    def train_step(state, node_idx, y, rng):
        return train_sm(state, node_idx, y, rng, x_sh, nm_sh, *plan_sh)

    @jax.jit
    def eval_step(state, node_idx, y):
        return eval_sm(state, node_idx, y, x_sh, nm_sh, *plan_sh)

    return train_step, eval_step


def make_lp_steps_node_parallel(cfg, optimizer, labels, graph, mesh: Mesh,
                                n_dev: int, forbidden, num_hard):
    """Node-partitioned variants of make_lp_steps: message passing over the
    halo-partitioned train edges; mining and scoring replicated on the
    all-gathered final embeddings (Cora-scale: [N, 256] ≈ 2.8 MB)."""
    from gnn_pretraining_tpu.finetune.finetune import FTState
    from gnn_pretraining_tpu.utils.losses import masked_bce_with_logits_mean

    plan, x_sh, nm_sh, plan_sh = _prepare(graph, n_dev)
    head = MLPLinkPredictor()

    def embed_full(params, stats, x_loc, nm_loc, plan_slices, train, rng):
        """Sharded encoder+backbone; returns the gathered [N_pad, F] rows."""
        model = _local_model(cfg.domain_name, plan, plan_slices, n_dev)
        variables = {"params": params, "batch_stats": stats}
        if train:
            h_loc, mut = model.apply(variables, x_loc, nm_loc, True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": _fold_drop(rng)},
                                     method=FinetuneGNN.embed)
            stats = mut["batch_stats"]
        else:
            h_loc = model.apply(variables, x_loc, nm_loc, False,
                                method=FinetuneGNN.embed)
        return jax.lax.all_gather(h_loc, "edge", axis=0, tiled=True), stats

    def score(params, h_full, ss, rr, train, rng):
        rngs = {"dropout": rng} if train else None
        return head.apply({"params": params["classification_head"]},
                          h_full, ss, rr, train, True, rngs=rngs)

    def _train_local(state, pos_edges, edge_mask_b, rng, x_loc, nm_loc,
                     *plan_slices):
        b = pos_edges.shape[1]
        k_emb, k_mine, k_drop, k_head = jax.random.split(rng, 4)
        emb, stats = embed_full(state.params, state.batch_stats, x_loc,
                                nm_loc, plan_slices, True, k_emb)
        emb = jax.lax.stop_gradient(emb)[:forbidden.shape[0]]
        neg_s, neg_r = mine_hard_negatives(emb, forbidden, k_mine,
                                           num_negatives=b, num_hard=num_hard)
        ss = jnp.concatenate([pos_edges[0], neg_s])
        rr = jnp.concatenate([pos_edges[1], neg_r])
        y = jnp.concatenate([jnp.ones(b), jnp.zeros(b)])
        mask = jnp.concatenate([edge_mask_b, edge_mask_b])

        def loss_fn(p):
            h_full, stats2 = embed_full(p, stats, x_loc, nm_loc,
                                        plan_slices, True, k_drop)
            z = score(p, h_full, ss, rr, True, k_head)
            loss = masked_bce_with_logits_mean(z, y, mask)
            return loss, (jax.nn.sigmoid(z), stats2)

        (loss, (probs, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state, gnorm = _replicated_update(
            optimizer, labels, state.params, state.opt_state, grads)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return (FTState(params, stats2, opt_state), loss,
                y.astype(jnp.int32), preds, probs2, mask, gnorm)

    def _eval_local(state, edges, y, edge_mask_b, x_loc, nm_loc,
                    *plan_slices):
        h_full, _ = embed_full(state.params, state.batch_stats, x_loc,
                               nm_loc, plan_slices, False, None)
        z = score(state.params, h_full, edges[0], edges[1], False, None)
        probs = jax.nn.sigmoid(z)
        loss = masked_bce_with_logits_mean(z, y, edge_mask_b)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return loss, y.astype(jnp.int32), preds, probs2

    def _strip(fn, n_lead):
        def wrapped(*args):
            head_args, tail = args[:n_lead], [a[0] for a in args[n_lead:]]
            return fn(*head_args, *tail)
        return wrapped

    train_sm = shard_map(
        _strip(_train_local, 4), mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("edge"), P("edge")) + (P("edge"),) * 7,
        out_specs=P(), check_vma=False)
    eval_sm = shard_map(
        _strip(_eval_local, 4), mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("edge"), P("edge")) + (P("edge"),) * 7,
        out_specs=P(), check_vma=False)

    @jax.jit
    def train_step(state, pos_edges, edge_mask_b, rng):
        return train_sm(state, pos_edges, edge_mask_b, rng, x_sh, nm_sh,
                        *plan_sh)

    @jax.jit
    def eval_step(state, edges, y, edge_mask_b):
        return eval_sm(state, edges, y, edge_mask_b, x_sh, nm_sh, *plan_sh)

    return train_step, eval_step
