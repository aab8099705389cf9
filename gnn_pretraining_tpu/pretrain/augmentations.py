"""Graph augmentations as masking on fixed shapes.

Behavioural port of src/pretrain/augmentations.py:17-111. The reference
physically drops nodes/edges and re-batches (CPU hot-spot, SURVEY.md §3.1);
here a view is the original padded batch plus masks, so both views of every
domain batch are produced on-device with zero reshaping:

  * node drop: always, rate 20%, min 3 nodes (drop count ``max(1, ⌊0.2·n⌋)``);
  * edge drop: per-graph gate p=0.2, rate 20% of the edges *surviving node
    drop*, min 3 such edges;
  * attribute mask: per-graph gate p=0.2, zero ``max(1, ⌊0.2·D⌋)`` feature
    columns, min 3 features (static skip).

Common-node bookkeeping (reference :77-85) is trivial under masking: a node is
a contrastive pair iff it is kept in both views — same row slot, no relabeling.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.batch import GraphBatch
from gnn_pretraining_tpu.ops.sampling import masked_randperm_select
from gnn_pretraining_tpu.ops.segment import segment_sum


class GraphView(NamedTuple):
    """An augmented view: same padded layout, different masks/features."""

    x: jnp.ndarray          # [N, D] (attribute-masked) features
    node_keep: jnp.ndarray  # [N] f32 — valid AND kept by node drop
    edge_keep: jnp.ndarray  # [E] f32 — valid AND both endpoints kept AND not edge-dropped


def augment_view(key: jax.Array, batch: GraphBatch) -> GraphView:
    """One augmented view (reference _create_augmented_view, :63-74)."""
    k_node, k_egate, k_edrop, k_agate, k_acols = jax.random.split(key, 5)
    g = batch.num_graphs
    node_valid = batch.node_mask.astype(bool)
    edge_valid = batch.edge_mask.astype(bool)

    # -- node drop (always; :44-60) ----------------------------------------
    can_drop = batch.n_node >= config.NODE_DROP_MIN_NUM_NODES
    num_drop = jnp.where(
        can_drop,
        jnp.maximum(1, (batch.n_node.astype(jnp.float32)
                        * config.NODE_DROP_RATE).astype(jnp.int32)),
        0)
    dropped = masked_randperm_select(k_node, batch.node_graph,
                                     batch.node_mask, num_drop)
    node_keep = node_valid & ~dropped

    edge_keep = edge_valid & node_keep[batch.senders] & node_keep[batch.receivers]

    # -- edge drop (gated per graph; :30-41,68-69) -------------------------
    gate_e = jax.random.uniform(k_egate, (g,)) < config.EDGE_DROP_PROB
    e_count = segment_sum(edge_keep.astype(jnp.float32), batch.edge_graph,
                          g).astype(jnp.int32)
    can_edrop = e_count >= config.EDGE_DROP_MIN_NUM_EDGES
    num_edrop = jnp.where(
        gate_e & can_edrop,
        jnp.maximum(1, (e_count.astype(jnp.float32)
                        * config.EDGE_DROP_RATE).astype(jnp.int32)),
        0)
    edropped = masked_randperm_select(k_edrop, batch.edge_graph,
                                      edge_keep.astype(jnp.float32), num_edrop)
    edge_keep = edge_keep & ~edropped

    # -- attribute mask (gated per graph; :17-27,71-72) --------------------
    x = batch.x
    d = x.shape[1]
    if d >= config.ATTR_MASK_MIN_NUM_FEATURES:
        num_cols = max(1, int(d * config.ATTR_MASK_RATE))
        gate_a = jax.random.uniform(k_agate, (g,)) < config.ATTR_MASK_PROB
        scores = jax.random.uniform(k_acols, (g, d))
        # smallest-`num_cols` scores per graph are the masked columns
        kth = jnp.sort(scores, axis=1)[:, num_cols - 1][:, None]
        col_masked = (scores <= kth) & gate_a[:, None]
        x = x * (1.0 - col_masked[batch.node_graph].astype(x.dtype))

    return GraphView(x=x, node_keep=node_keep.astype(jnp.float32),
                     edge_keep=edge_keep.astype(jnp.float32))


def create_two_views(key: jax.Array, batch: GraphBatch
                     ) -> Tuple[GraphView, GraphView, jnp.ndarray]:
    """Two independent views + the common-node pair mask (reference :88-111)."""
    k1, k2 = jax.random.split(key)
    v1 = augment_view(k1, batch)
    v2 = augment_view(k2, batch)
    common = v1.node_keep * v2.node_keep
    return v1, v2, common
