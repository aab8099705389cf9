"""The six pretraining tasks as pure jit-able loss functions.

Behavioural ports of src/pretrain/tasks.py:61-343. Each task computes, for a
dict of per-domain padded batches, ``(scalar_loss, {domain: loss})`` with the
reference's size-weighted aggregation: scalar = Σ per-domain loss *sums* /
Σ element counts. BatchNorm running stats thread through every forward in the
same order the reference executes them (tasks outer, domains inner).

Static-shape re-designs (semantics preserved):
  * NFM masking selects ``max(1, ⌊0.15·n⌋)`` nodes per graph (min 3) as a
    boolean mask; the no-grad encode still updates BN stats in train mode
    (reference pretrain_model.py:67-88).
  * LP negatives come from fixed-round rejection sampling (ops/sampling.py)
    instead of PyG ``batched_negative_sampling``.
  * Contrastive views are masks (pretrain/augmentations.py); NT-Xent runs on
    padded rows with a validity mask (ops/sddmm.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.utils.losses import bce_with_logits
from gnn_pretraining_tpu.data.batch import GraphBatch
from gnn_pretraining_tpu.data.properties import GRAPH_PROPERTY_DIM
from gnn_pretraining_tpu.models.pretrain_model import PretrainableGNN
from gnn_pretraining_tpu.ops.sampling import (
    batched_negative_sampling,
    masked_randperm_select,
)
from gnn_pretraining_tpu.ops.ntxent_pallas import nt_xent_pallas
from gnn_pretraining_tpu.ops.sddmm import nt_xent_loss
from gnn_pretraining_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_softmax_ce,
)
from gnn_pretraining_tpu.ops.spmm import build_dense_adjacency
from gnn_pretraining_tpu.pretrain.augmentations import create_two_views

H = config.GNN_HIDDEN_DIM


class TaskContext(NamedTuple):
    temperature: jnp.ndarray
    grl_lambda: jnp.ndarray
    train: bool
    # Mesh axis for data-parallel execution inside shard_map: additive task
    # sums are psum'd over it and contrastive rows are all_gather'd, so the
    # step computes exactly the single-device global loss.
    axis_name: str | None = None


def _nt_xent(z1, z2, temperature, valid, axis_name):
    # Shape is static under jit, so this dispatch costs nothing at runtime:
    # small batches take the XLA formula (faster on-chip below the
    # threshold), large ones the fused Pallas kernel (O(N) memory).
    if (axis_name is None and config.FUSED_NTXENT
            and z1.shape[0] >= config.FUSED_NTXENT_MIN_ROWS):
        return nt_xent_pallas(z1, z2, temperature, valid)
    return nt_xent_loss(z1, z2, temperature, valid, axis_name=axis_name)


def _preduce(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _apply_forward(model: PretrainableGNN, params, stats, x, node_mask, domain,
                   key, train, *, adj, senders, receivers, edge_mask):
    """One encoder+backbone forward, threading batch_stats in train mode."""
    variables = {"params": params, "batch_stats": stats}
    if train:
        out, mut = model.apply(
            variables, x, node_mask, domain, True, adj=adj, senders=senders,
            receivers=receivers, edge_mask=edge_mask,
            mutable=["batch_stats"], rngs={"dropout": key})
        return out, mut["batch_stats"]
    out = model.apply(variables, x, node_mask, domain, False, adj=adj,
                      senders=senders, receivers=receivers, edge_mask=edge_mask)
    return out, stats


def _apply_method(model, params, stats, method, args, key, train):
    variables = {"params": params, "batch_stats": stats}
    if train:
        out, mut = model.apply(variables, *args, mutable=["batch_stats"],
                               rngs={"dropout": key}, method=method)
        return out, mut["batch_stats"]
    out = model.apply(variables, *args, method=method)
    return out, stats


def _head(model, params, method, args, key, train):
    """Heads have no BN, so no stats threading — just dropout rngs."""
    variables = {"params": params}
    if train:
        return model.apply(variables, *args, rngs={"dropout": key}, method=method)
    return model.apply(variables, *args, method=method)


def _adj_dtype(model) -> jnp.dtype:
    # bf16 adjacency is exact and halves HBM traffic for the Pallas kernel.
    return jnp.bfloat16 if model.aggregation == "pallas" else jnp.float32


def _batch_adj(batch: GraphBatch, model, edge_mask=None) -> jnp.ndarray:
    return build_dense_adjacency(batch.senders, batch.receivers,
                                 batch.edge_mask if edge_mask is None else edge_mask,
                                 batch.num_nodes, dtype=_adj_dtype(model))


def _safe_div(a, b):
    return a / jnp.maximum(b, 1.0)


# ---------------------------------------------------------------------------
# Tasks
# ---------------------------------------------------------------------------


def node_feat_mask_loss(model, params, stats, domain_batches, key, ctx):
    """Reference: tasks.py:70-94 + pretrain_model.py:67-88."""
    total_loss = 0.0
    total_size = 0.0
    per_domain = {}
    for domain, batch in domain_batches.items():
        key, k_enc, k_sel, k_bb, k_head = jax.random.split(key, 5)
        # no-grad encode; BN stats still update in train mode (:68-69)
        h0, stats = _apply_method(model, params, stats, PretrainableGNN.encode,
                                  (batch.x, batch.node_mask, domain, ctx.train),
                                  k_enc, ctx.train)
        h0 = jax.lax.stop_gradient(h0)

        n = batch.n_node
        num_mask = jnp.where(
            n >= config.NODE_FEATURE_MASKING_MIN_NUM_NODES,
            jnp.maximum(1, (n.astype(jnp.float32)
                            * config.NODE_FEATURE_MASKING_MASK_RATE).astype(jnp.int32)),
            0)
        mask = masked_randperm_select(k_sel, batch.node_graph, batch.node_mask,
                                      num_mask)
        mask_f = mask.astype(jnp.float32)

        mask_token = model.apply({"params": params},
                                 method=PretrainableGNN.get_mask_token)
        masked_h0 = jnp.where(mask[:, None], mask_token[None, :], h0)

        adj = _batch_adj(batch, model)
        h_final, stats = _apply_backbone(model, params, stats, masked_h0,
                                         batch, adj, k_bb, ctx.train)

        rec = _head(model, params, PretrainableGNN.nfm_head,
                    (h_final, domain, ctx.train), k_head, ctx.train)
        sq = jnp.sum((rec - h0) ** 2, axis=1) * mask_f
        loss_sum = _preduce(jnp.sum(sq), ctx.axis_name)
        size = _preduce(jnp.sum(mask_f), ctx.axis_name) * H
        total_loss += loss_sum
        total_size += size
        per_domain[domain] = _safe_div(loss_sum, size)
    return _safe_div(total_loss, total_size), per_domain, stats


def _apply_backbone(model, params, stats, h0, batch, adj, key, train):
    variables = {"params": params, "batch_stats": stats}
    args = (h0, batch.node_mask, train)
    kwargs = dict(adj=adj, senders=batch.senders, receivers=batch.receivers,
                  edge_mask=batch.edge_mask)
    if train:
        out, mut = model.apply(variables, *args, mutable=["batch_stats"],
                               rngs={"dropout": key},
                               method=PretrainableGNN.run_backbone, **kwargs)
        return out, mut["batch_stats"]
    out = model.apply(variables, *args, method=PretrainableGNN.run_backbone,
                      **kwargs)
    return out, stats


def link_pred_loss(model, params, stats, domain_batches, key, ctx):
    """Reference: tasks.py:97-127."""
    total_loss = 0.0
    total_size = 0.0
    per_domain = {}
    for domain, batch in domain_batches.items():
        key, k_neg, k_fwd, k_head = jax.random.split(key, 4)
        adj = _batch_adj(batch, model)
        und = ((adj.astype(jnp.float32) + adj.T.astype(jnp.float32)) > 0
               ).astype(jnp.float32)
        neg_s, neg_r = batched_negative_sampling(
            k_neg, und, batch.edge_graph, batch.edge_mask, batch.node_start,
            batch.n_node)

        h, stats = _apply_forward(
            model, params, stats, batch.x, batch.node_mask, domain, k_fwd,
            ctx.train, adj=adj, senders=batch.senders,
            receivers=batch.receivers, edge_mask=batch.edge_mask)

        senders = jnp.concatenate([batch.senders, neg_s])
        receivers = jnp.concatenate([batch.receivers, neg_r])
        labels = jnp.concatenate([jnp.ones(batch.num_edges),
                                  jnp.zeros(batch.num_edges)])
        mask = jnp.concatenate([batch.edge_mask, batch.edge_mask])

        # Logits + stable fused BCE (value matches torch's clamped
        # BCE-on-probs wherever |z| <= 100; gradient never overflows --
        # see utils/losses.py).
        z = _head(model, params, PretrainableGNN.link_pred_head,
                  (h, senders, receivers, ctx.train, True), k_head, ctx.train)
        bce = bce_with_logits(z, labels) * mask
        loss_sum = _preduce(jnp.sum(bce), ctx.axis_name)
        size = _preduce(jnp.sum(mask), ctx.axis_name)
        total_loss += loss_sum
        total_size += size
        per_domain[domain] = _safe_div(loss_sum, size)
    return _safe_div(total_loss, total_size), per_domain, stats


def _view_forward(model, params, stats, batch, view, domain, key, train):
    adj = _batch_adj(batch, model, edge_mask=view.edge_keep)
    return _apply_forward(model, params, stats, view.x, view.node_keep, domain,
                          key, train, adj=adj, senders=batch.senders,
                          receivers=batch.receivers, edge_mask=view.edge_keep)


def node_contrast_loss(model, params, stats, domain_batches, key, ctx):
    """Reference: tasks.py:130-213."""
    total_loss = 0.0
    total_size = 0.0
    per_domain = {}
    for domain, batch in domain_batches.items():
        key, k_aug, k_f1, k_f2, k_h1, k_h2 = jax.random.split(key, 6)
        v1, v2, common = create_two_views(k_aug, batch)
        h1, stats = _view_forward(model, params, stats, batch, v1, domain, k_f1, ctx.train)
        h2, stats = _view_forward(model, params, stats, batch, v2, domain, k_f2, ctx.train)

        z1 = _head(model, params, PretrainableGNN.node_contrast_head,
                   (h1, domain, ctx.train), k_h1, ctx.train)
        z2 = _head(model, params, PretrainableGNN.node_contrast_head,
                   (h2, domain, ctx.train), k_h2, ctx.train)

        loss_sum, rows = _nt_xent(z1, z2, ctx.temperature, common,
                                  ctx.axis_name)
        # skip domain when fewer than 2 common nodes (:173-175)
        valid = (_preduce(jnp.sum(common), ctx.axis_name) >= 2).astype(jnp.float32)
        loss_sum = loss_sum * valid
        rows = rows * valid
        total_loss += loss_sum
        total_size += rows
        per_domain[domain] = _safe_div(loss_sum, rows)
    return _safe_div(total_loss, total_size), per_domain, stats


def graph_contrast_loss(model, params, stats, domain_batches, key, ctx):
    """Reference: tasks.py:216-287."""
    total_loss = 0.0
    total_size = 0.0
    per_domain = {}
    for domain, batch in domain_batches.items():
        key, k_aug, k_f1, k_f2, k_h1, k_h2 = jax.random.split(key, 6)
        g = batch.num_graphs
        v1, v2, _ = create_two_views(k_aug, batch)
        h1, stats = _view_forward(model, params, stats, batch, v1, domain, k_f1, ctx.train)
        h2, stats = _view_forward(model, params, stats, batch, v2, domain, k_f2, ctx.train)

        s1 = jnp.concatenate(
            [segment_mean(h1, batch.node_graph, g, v1.node_keep),
             segment_max(h1, batch.node_graph, g, v1.node_keep)], axis=1)
        s2 = jnp.concatenate(
            [segment_mean(h2, batch.node_graph, g, v2.node_keep),
             segment_max(h2, batch.node_graph, g, v2.node_keep)], axis=1)

        z1 = _head(model, params, PretrainableGNN.graph_contrast_head,
                   (s1, domain, ctx.train), k_h1, ctx.train)
        z2 = _head(model, params, PretrainableGNN.graph_contrast_head,
                   (s2, domain, ctx.train), k_h2, ctx.train)

        loss_sum, rows = _nt_xent(z1, z2, ctx.temperature, batch.graph_mask,
                                  ctx.axis_name)
        # skip domain with fewer than 2 graphs (:231-234)
        valid = (_preduce(jnp.sum(batch.graph_mask), ctx.axis_name)
                 >= 2).astype(jnp.float32)
        loss_sum = loss_sum * valid
        rows = rows * valid
        total_loss += loss_sum
        total_size += rows
        per_domain[domain] = _safe_div(loss_sum, rows)
    return _safe_div(total_loss, total_size), per_domain, stats


def graph_prop_loss(model, params, stats, domain_batches, key, ctx):
    """Reference: tasks.py:290-312."""
    total_loss = 0.0
    total_size = 0.0
    per_domain = {}
    for domain, batch in domain_batches.items():
        key, k_fwd, k_head = jax.random.split(key, 3)
        g = batch.num_graphs
        adj = _batch_adj(batch, model)
        h, stats = _apply_forward(
            model, params, stats, batch.x, batch.node_mask, domain, k_fwd,
            ctx.train, adj=adj, senders=batch.senders,
            receivers=batch.receivers, edge_mask=batch.edge_mask)
        graph_emb = segment_mean(h, batch.node_graph, g, batch.node_mask)
        preds = _head(model, params, PretrainableGNN.graph_prop_head,
                      (graph_emb, domain, ctx.train), k_head, ctx.train)
        sq = jnp.sum((preds - batch.graph_properties) ** 2, axis=1) * batch.graph_mask
        loss_sum = _preduce(jnp.sum(sq), ctx.axis_name)
        size = _preduce(jnp.sum(batch.graph_mask), ctx.axis_name) * GRAPH_PROPERTY_DIM
        total_loss += loss_sum
        total_size += size
        per_domain[domain] = _safe_div(loss_sum, size)
    return _safe_div(total_loss, total_size), per_domain, stats


def domain_adv_loss(model, params, stats, domain_batches, key, ctx):
    """Reference: tasks.py:315-343. Domain label = index in the scheme's
    domain tuple (insertion order of input_encoders, :318) — a FIXED mapping
    via ``model.domain_names``, never the position in ``domain_batches``
    (the per-domain eval path passes single-domain dicts, where an
    enumeration index would label every domain 0)."""
    total_loss = 0.0
    total_size = 0.0
    per_domain = {}
    for domain, batch in domain_batches.items():
        idx = model.domain_names.index(domain)
        key, k_fwd, k_head = jax.random.split(key, 3)
        g = batch.num_graphs
        adj = _batch_adj(batch, model)
        h, stats = _apply_forward(
            model, params, stats, batch.x, batch.node_mask, domain, k_fwd,
            ctx.train, adj=adj, senders=batch.senders,
            receivers=batch.receivers, edge_mask=batch.edge_mask)
        graph_emb = segment_mean(h, batch.node_graph, g, batch.node_mask)
        logits = _head(model, params, PretrainableGNN.domain_adv_head,
                       (graph_emb, ctx.grl_lambda, ctx.train), k_head, ctx.train)
        labels = jnp.full((g,), idx, jnp.int32)
        loss_sum, _ = segment_softmax_ce(logits, labels, row_mask=batch.graph_mask)
        loss_sum = _preduce(loss_sum, ctx.axis_name)
        size = _preduce(jnp.sum(batch.graph_mask), ctx.axis_name)
        total_loss += loss_sum
        total_size += size
        per_domain[domain] = _safe_div(loss_sum, size)
    return _safe_div(total_loss, total_size), per_domain, stats


TASK_FNS = {
    "node_feat_mask": node_feat_mask_loss,
    "link_pred": link_pred_loss,
    "node_contrast": node_contrast_loss,
    "graph_contrast": graph_contrast_loss,
    "graph_prop": graph_prop_loss,
    "domain_adv": domain_adv_loss,
}


def compute_task_loss(task_name: str, model, params, stats,
                      domain_batches: Dict[str, GraphBatch], key, ctx: TaskContext
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], dict]:
    return TASK_FNS[task_name](model, params, stats, domain_batches, key, ctx)
