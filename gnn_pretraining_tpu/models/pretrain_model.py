"""PretrainableGNN: per-domain encoders + shared backbone + task heads.

Behavioural port of src/models/pretrain_model.py:23-99 as one flax module with
method-based application. Head inventory mirrors the reference exactly
(:38-63): NFM [256→256→256] per domain, LP shared link predictor,
node-contrast [256→256→128] per domain, graph-contrast [512→256→128] per
domain, graph-prop [256→512→12] per domain, domain-adv shared GRL head; plus
the learnable mask token (init N(0, 0.1²), :33-34).

Node masking (:67-88) lives in the task layer (pretrain/tasks.py) — it needs
PRNG keys and stop_gradient threading — but the semantics (no-grad encode that
still updates BN running stats, per-graph 15% masking with min size 3, mask
token substitution) are preserved there.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.properties import GRAPH_PROPERTY_DIM
from gnn_pretraining_tpu.models.gnn import GINBackbone, InputEncoder
from gnn_pretraining_tpu.models.heads import (
    DomainClassifierHead,
    MLPHead,
    MLPLinkPredictor,
)

H = config.GNN_HIDDEN_DIM
P = config.CONTRASTIVE_PROJ_DIM


class PretrainableGNN(nn.Module):
    domain_names: Tuple[str, ...]
    task_names: Tuple[str, ...]
    aggregation: str = "dense"
    axis_name: Optional[str] = None
    remat: bool = False  # per-layer jax.checkpoint in the backbone

    def setup(self):
        self.input_encoders = {d: InputEncoder(axis_name=self.axis_name)
                               for d in self.domain_names}
        self.mask_token = self.param(
            "mask_token",
            lambda k, s: config.MASK_TOKEN_INIT_STD * jax.random.normal(k, s),
            (H,))
        self.gnn_backbone = GINBackbone(self.aggregation, self.axis_name,
                                        remat=self.remat)

        if "node_feat_mask" in self.task_names:
            self.heads_node_feat_mask = {
                d: MLPHead((H, H, H)) for d in self.domain_names}
        if "link_pred" in self.task_names:
            self.heads_link_pred = MLPLinkPredictor()
        if "node_contrast" in self.task_names:
            self.heads_node_contrast = {
                d: MLPHead((H, H, P)) for d in self.domain_names}
        if "graph_contrast" in self.task_names:
            self.heads_graph_contrast = {
                d: MLPHead((2 * H, H, P)) for d in self.domain_names}
        if "graph_prop" in self.task_names:
            self.heads_graph_prop = {
                d: MLPHead((H, config.GRAPH_PROP_HIDDEN_DIM, GRAPH_PROPERTY_DIM))
                for d in self.domain_names}
        if "domain_adv" in self.task_names:
            self.heads_domain_adv = DomainClassifierHead()

    # -- forward pieces (reference pretrain_model.py:90-95) -----------------

    def encode(self, x, node_mask, domain: str, train: bool):
        return self.input_encoders[domain](x, node_mask, train)

    def run_backbone(self, h0, node_mask, train: bool, *, adj=None,
                     senders=None, receivers=None, edge_mask=None, bsr=None):
        return self.gnn_backbone(h0, node_mask, train, adj=adj,
                                 senders=senders, receivers=receivers,
                                 edge_mask=edge_mask, bsr=bsr)

    def __call__(self, x, node_mask, domain: str, train: bool, *, adj=None,
                 senders=None, receivers=None, edge_mask=None, bsr=None):
        h0 = self.encode(x, node_mask, domain, train)
        return self.run_backbone(h0, node_mask, train, adj=adj,
                                 senders=senders, receivers=receivers,
                                 edge_mask=edge_mask, bsr=bsr)

    def get_mask_token(self):
        return self.mask_token

    # -- heads ---------------------------------------------------------------

    def nfm_head(self, h, domain: str, train: bool):
        return self.heads_node_feat_mask[domain](h, train)

    def link_pred_head(self, h, senders, receivers, train: bool,
                       return_logits: bool = False):
        return self.heads_link_pred(h, senders, receivers, train,
                                    return_logits)

    def node_contrast_head(self, z, domain: str, train: bool):
        return self.heads_node_contrast[domain](z, train)

    def graph_contrast_head(self, z, domain: str, train: bool):
        return self.heads_graph_contrast[domain](z, train)

    def graph_prop_head(self, z, domain: str, train: bool):
        return self.heads_graph_prop[domain](z, train)

    def domain_adv_head(self, z, lam, train: bool):
        return self.heads_domain_adv(z, lam, train)
