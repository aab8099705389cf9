"""Masked BatchNorm with torch.nn.BatchNorm1d semantics.

The reference normalizes over all node rows of a batch (torch BatchNorm1d,
src/models/gnn.py:15,32,38). Our batches are padded, so statistics must be
computed over *valid* rows only — then the numbers match the reference's
exactly (same rows, same sums). Semantics replicated:

  * train: normalize with biased batch variance; update running stats with
    momentum 0.1, using the *unbiased* variance (torch's running-var rule).
  * eval: normalize with running stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_pretraining_tpu import config


class MaskedBatchNorm(nn.Module):
    """``axis_name`` turns on SyncBN: statistics are reduced over that mesh
    axis with ``psum``, so a data-parallel step normalizes with exactly the
    global-batch statistics a single device would compute."""

    features: int
    momentum: float = config.BN_MOMENTUM
    eps: float = config.BN_EPS
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None,
                 train: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))

        if train:
            if mask is not None:
                m = mask.astype(x.dtype)[:, None]
                n = jnp.sum(m)
                sum_x = jnp.sum(x * m, axis=0)
            else:
                m = None
                n = jnp.asarray(x.shape[0], x.dtype)
                sum_x = jnp.sum(x, axis=0)
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
                sum_x = jax.lax.psum(sum_x, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = sum_x / n
            # Two-pass variance, as torch computes it (mean((x-mean)^2)):
            # the single-pass E[x^2]-mean^2 form cancels catastrophically in
            # f32 once |mean| >> std, clamping var to 0 and blowing the
            # normalized activations up by 1/sqrt(eps).
            dev = x - mean
            sq = dev * dev if m is None else dev * dev * m
            sum_sq = jnp.sum(sq, axis=0)
            if self.axis_name is not None:
                sum_sq = jax.lax.psum(sum_sq, self.axis_name)
            var = sum_sq / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
        if mask is not None:
            y = y * mask.astype(y.dtype)[:, None]
        return y
