"""Shared GNN building blocks: InputEncoder, GINLayer, GINBackbone.

Behavioural ports of the reference modules (src/models/gnn.py:11-54) on padded
masked batches:

  * InputEncoder: Linear(d→256) → BatchNorm → ReLU → Dropout(0.2)
  * GINLayer: GINConv(MLP[256→512(+BN+ReLU)→256], train_eps) with residual,
    then BN → ReLU → Dropout(0.2). The GINConv neighbor sum runs on the MXU
    (ops/spmm.py) instead of scatter-add.
  * GINBackbone: 5 stacked GINLayers, hidden 256.

Parameter init matches torch.nn.Linear (kaiming-uniform a=√5 ⇒
U(±1/√fan_in) for both weight and bias) so from-scratch training dynamics are
comparable.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.models.norm import MaskedBatchNorm
from gnn_pretraining_tpu.ops.spmm import (
    gin_aggregate_coo,
    gin_aggregate_dense,
    spmm_pallas,
)


def torch_linear_init(fan_in):
    """torch ``nn.Linear``'s U(±1/√fan_in) rule — one bound for kernel
    (kaiming_uniform with a=√5 collapses to it) AND bias."""
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        init = torch_linear_init(fan_in)
        kernel = self.param("kernel", init, (fan_in, self.features))
        bias = self.param("bias", init, (self.features,))
        return x @ kernel + bias


class InputEncoder(nn.Module):
    """Per-domain projector (reference: src/models/gnn.py:11-23)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: Optional[jnp.ndarray],
                 train: bool) -> jnp.ndarray:
        h = TorchLinear(config.GNN_HIDDEN_DIM, name="linear")(x)
        h = MaskedBatchNorm(config.GNN_HIDDEN_DIM, name="batch_norm",
                            axis_name=self.axis_name)(h, node_mask, train)
        h = nn.relu(h)
        h = nn.Dropout(config.DROPOUT_RATE, deterministic=not train)(h)
        return h


def _aggregate(h: jnp.ndarray, eps: jnp.ndarray, adj, senders, receivers,
               edge_mask, impl: str, edge_axis=None, bsr=None) -> jnp.ndarray:
    if impl == "csr" or bsr is not None:
        from gnn_pretraining_tpu.ops.spmm_csr import gin_aggregate_csr

        if bsr is None:
            raise ValueError(
                "aggregation='csr' requires a prebuilt BlockCSR passed as "
                "bsr= (host-side, ops/spmm_csr.build_block_csr); the batch "
                "drivers only feed adj/COO operands")
        return gin_aggregate_csr(h, bsr, eps)
    if impl == "coo" or adj is None:
        return gin_aggregate_coo(h, senders, receivers, edge_mask, eps,
                                 edge_axis=edge_axis)
    if impl == "pallas":
        return spmm_pallas(adj, h, eps)
    return gin_aggregate_dense(h, adj, eps)


class GINLayer(nn.Module):
    """GINConv + residual + BN + ReLU + Dropout (reference: gnn.py:26-43)."""

    aggregation: str = "dense"   # "dense" | "pallas" | "coo" | "csr"
    axis_name: Optional[str] = None
    edge_axis: Optional[str] = None  # mesh axis for edge-partitioned coo
    # Custom ``(h, eps) -> z`` aggregation override. Lets a shard_map body
    # inject a partition-aware aggregate (e.g. the node-partitioned halo
    # exchange, parallel/node_partition.halo_aggregate_local) while reusing
    # the module's MLP/BN/residual stack unchanged.
    aggregate_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, node_mask, train: bool, *,
                 adj=None, senders=None, receivers=None, edge_mask=None,
                 bsr=None) -> jnp.ndarray:
        # PyG GINConv(train_eps=True) starts at eps=0.
        eps = self.param("eps", nn.initializers.zeros, ())
        if self.aggregate_fn is not None:
            z = self.aggregate_fn(h, eps)
        else:
            z = _aggregate(h, eps, adj, senders, receivers, edge_mask,
                           self.aggregation, self.edge_axis, bsr=bsr)
        # The GIN MLP: 256 → 512 (+BN+ReLU) → 256.
        z = TorchLinear(2 * config.GNN_HIDDEN_DIM, name="mlp_0")(z)
        z = MaskedBatchNorm(2 * config.GNN_HIDDEN_DIM, name="mlp_bn",
                            axis_name=self.axis_name)(z, node_mask, train)
        z = nn.relu(z)
        z = TorchLinear(config.GNN_HIDDEN_DIM, name="mlp_1")(z)

        z = z + h  # residual
        z = MaskedBatchNorm(config.GNN_HIDDEN_DIM, name="batch_norm",
                            axis_name=self.axis_name)(z, node_mask, train)
        z = nn.relu(z)
        z = nn.Dropout(config.DROPOUT_RATE, deterministic=not train)(z)
        return z


class GINBackbone(nn.Module):
    """5 stacked GINLayers (reference: gnn.py:46-54).

    ``remat=True`` rematerializes each layer's activations in the backward
    pass (``jax.checkpoint``): the standard HBM-for-FLOPs trade on TPU —
    peak activation memory drops from O(layers · N · F) to O(N · F) while
    gradients stay bit-identical (tests/test_model_parity.py)."""

    aggregation: str = "dense"
    axis_name: Optional[str] = None
    edge_axis: Optional[str] = None
    remat: bool = False
    aggregate_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, node_mask, train: bool, *,
                 adj=None, senders=None, receivers=None, edge_mask=None,
                 bsr=None) -> jnp.ndarray:
        layer_cls = (nn.remat(GINLayer, static_argnums=(3,))
                     if self.remat else GINLayer)
        for i in range(config.GNN_NUM_LAYERS):
            h = layer_cls(self.aggregation, self.axis_name, self.edge_axis,
                          aggregate_fn=self.aggregate_fn,
                          name=f"layers_{i}")(
                h, node_mask, train, adj=adj, senders=senders,
                receivers=receivers, edge_mask=edge_mask, bsr=bsr)
        return h
