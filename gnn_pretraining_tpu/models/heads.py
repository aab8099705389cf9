"""Prediction heads and the gradient-reversal layer.

Behavioural ports of src/models/heads.py: generic MLP head, the
sum/product/|diff| link predictor, and the GRL domain classifier. The GRL is a
``jax.custom_vjp`` (identity forward, ``-λ·g`` backward), replacing the torch
``autograd.Function`` (reference: heads.py:16-32).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.models.gnn import TorchLinear


@jax.custom_vjp
def grad_reverse(x: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    return x


def _grad_reverse_fwd(x, lam):
    return x, lam


def _grad_reverse_bwd(lam, g):
    return -lam * g, None


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


class MLPHead(nn.Module):
    """[dims...] MLP; ReLU+Dropout between hidden layers (ref heads.py:35-50)."""

    dims: Tuple[int, ...]
    dropout_rates: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        n = len(self.dims) - 1
        for i in range(n):
            x = TorchLinear(self.dims[i + 1], name=f"linear_{i}")(x)
            if i < n - 1:
                x = nn.relu(x)
                rate = (self.dropout_rates[i] if self.dropout_rates is not None
                        else config.DROPOUT_RATE)
                x = nn.Dropout(rate, deterministic=not train)(x)
        return x


class MLPLinkPredictor(nn.Module):
    """Edge scorer: [h_u+h_v ; h_u⊙h_v ; |h_u−h_v|] → MLP[768→256→1] → sigmoid
    (reference: heads.py:53-67).

    ``return_logits=True`` skips the sigmoid so losses can use the numerically
    stable BCE-with-logits form: the fused sigmoid+BCE gradient (p − y) never
    overflows, whereas BCE on probabilities has dL/dp = −1/p, which overflows
    f32 once the sigmoid saturates (observed as NaN params on TPU, where bf16
    matmul noise pushes logits past the saturation point sooner than f32)."""

    @nn.compact
    def __call__(self, h: jnp.ndarray, senders: jnp.ndarray,
                 receivers: jnp.ndarray, train: bool,
                 return_logits: bool = False) -> jnp.ndarray:
        h_src = h[senders]
        h_dst = h[receivers]
        feats = jnp.concatenate(
            [h_src + h_dst, h_src * h_dst, jnp.abs(h_src - h_dst)], axis=1)
        logits = MLPHead((3 * config.GNN_HIDDEN_DIM, config.GNN_HIDDEN_DIM, 1),
                         name="predictor")(feats, train)
        if return_logits:
            return logits[:, 0]
        return jax.nn.sigmoid(logits[:, 0])


class DomainClassifierHead(nn.Module):
    """GRL → MLP[256→128→4] with dropout 0.5 (reference: heads.py:70-82)."""

    num_domains: int = len(config.PRETRAIN_TUDATASETS)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lam: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = grad_reverse(x, lam)
        return MLPHead(
            (config.GNN_HIDDEN_DIM, config.DOMAIN_CLASSIFIER_HIDDEN_DIM,
             self.num_domains),
            dropout_rates=(config.DOMAIN_CLASSIFIER_DROPOUT_RATE,),
            name="classifier")(x, train)
