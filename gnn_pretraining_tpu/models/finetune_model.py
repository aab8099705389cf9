"""FinetuneGNN: single-domain encoder + backbone + task head, plus transfer.

Behavioural port of src/models/finetune_model.py:20-80 and the
backbone-weight transfer contract (:128-146): only ``gnn_backbone.*`` keys are
copied from the pretrained checkpoint (params *and* BN running stats, as
torch's state_dict includes both), and for ENZYMES additionally
``input_encoders.ENZYMES.* → input_encoder.*``. Freeze rules (encoder frozen
for ENZYMES, backbone frozen for linear_probe, per-group LRs, :38-64) are
enforced by the optimizer masks in finetune/optimizers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze, unfreeze

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.models.gnn import GINBackbone, InputEncoder
from gnn_pretraining_tpu.models.heads import MLPHead, MLPLinkPredictor
from gnn_pretraining_tpu.ops.segment import segment_mean

H = config.GNN_HIDDEN_DIM


class FinetuneGNN(nn.Module):
    domain_name: str
    aggregation: str = "dense"
    axis_name: Optional[str] = None
    edge_axis: Optional[str] = None  # edge-partitioned message passing
    remat: bool = False  # per-layer jax.checkpoint in the backbone
    aggregate_fn: Optional[Any] = None  # custom (h, eps) -> z override

    def setup(self):
        self.input_encoder = InputEncoder(axis_name=self.axis_name)
        self.gnn_backbone = GINBackbone(self.aggregation, self.axis_name,
                                        self.edge_axis, remat=self.remat,
                                        aggregate_fn=self.aggregate_fn)
        task_type = config.TASK_TYPES[self.domain_name]
        c = config.NUM_CLASSES[self.domain_name]
        if task_type == "graph_classification":
            self.classification_head = MLPHead((H, config.FINETUNE_HIDDEN_DIM, c))
        elif task_type == "node_classification":
            self.classification_head = MLPHead((H, c))  # no hidden layer (:34)
        elif task_type == "link_prediction":
            self.classification_head = MLPLinkPredictor()

    def embed(self, x, node_mask, train: bool, *, adj=None, senders=None,
              receivers=None, edge_mask=None, bsr=None):
        """Encoder + backbone; the message-passing edge set is whatever edge
        structure is passed in (reference: forward's message_passing_edges,
        finetune_model.py:70)."""
        h0 = self.input_encoder(x, node_mask, train)
        return self.gnn_backbone(h0, node_mask, train, adj=adj,
                                 senders=senders, receivers=receivers,
                                 edge_mask=edge_mask, bsr=bsr)

    def __call__(self, x, node_mask, train: bool, *, adj=None, senders=None,
                 receivers=None, edge_mask=None, bsr=None, node_graph=None,
                 graph_mask=None, num_graphs: Optional[int] = None,
                 score_senders=None, score_receivers=None,
                 return_logits: bool = False):
        h = self.embed(x, node_mask, train, adj=adj, senders=senders,
                       receivers=receivers, edge_mask=edge_mask, bsr=bsr)
        task_type = config.TASK_TYPES[self.domain_name]
        if task_type == "graph_classification":
            graph_emb = segment_mean(h, node_graph, num_graphs, node_mask)
            return self.classification_head(graph_emb, train)
        if task_type == "node_classification":
            return self.classification_head(h, train)
        if task_type == "link_prediction":
            return self.classification_head(h, score_senders, score_receivers,
                                            train, return_logits)
        raise ValueError(task_type)


def load_pretrained_into_finetune(finetune_vars: Dict[str, Any],
                                  pretrain_vars: Dict[str, Any],
                                  domain_name: str) -> Dict[str, Any]:
    """Copy the transfer subtrees from a pretrain checkpoint's variables.

    Matches load_pretrained_weights (reference finetune_model.py:128-146):
    backbone params + BN stats always; ENZYMES also gets its pretrain domain
    encoder.
    """
    ft = unfreeze(finetune_vars)
    pt = unfreeze(pretrain_vars)
    for col in ("params", "batch_stats"):
        if "gnn_backbone" in pt.get(col, {}):
            ft[col]["gnn_backbone"] = pt[col]["gnn_backbone"]
        enc_key = "input_encoders_ENZYMES"
        if domain_name == "ENZYMES" and enc_key in pt.get(col, {}):
            ft[col]["input_encoder"] = pt[col][enc_key]
    return freeze(ft) if isinstance(finetune_vars, type(freeze({}))) else ft
