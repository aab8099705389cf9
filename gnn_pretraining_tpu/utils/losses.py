"""Shared numerically stable loss primitives.

The reference computes link-prediction losses as ``F.binary_cross_entropy``
on sigmoid *probabilities* (src/finetune/finetune.py:203-205,
src/pretrain/tasks.py:119-126). torch clamps the log terms at -100, but the
gradient dL/dp = -y/p + (1-y)/(1-p) still overflows f32 once the sigmoid
saturates (p < ~3e-39); on TPU the bf16 matmul units reach that regime a few
steps into training and a single inf·0 = NaN poisons every parameter. We
therefore keep the model's sigmoid-probability API for metrics but compute
all BCE *losses* from logits with the fused stable form, whose gradient is
(sigmoid(z) - y) and never overflows. Loss values are identical to the
reference except where torch's -100 clamp binds (|z| > 100), a regime the
reference only reaches when its own gradients are already degenerate.
"""

from __future__ import annotations

import jax.numpy as jnp

_LOG_CLAMP = -100.0  # torch.binary_cross_entropy clamps log terms at -100


def bce_with_logits(z: jnp.ndarray, y: jnp.ndarray,
                    clamp: bool = True) -> jnp.ndarray:
    """Elementwise stable BCE from logits: max(z,0) - z·y + log1p(e^-|z|).

    With ``clamp=True`` (the LP paths, where the reference computes BCE on
    sigmoid probabilities) the per-element loss is capped at 100, matching
    torch's clamped BCE-on-probs value wherever |z| ≤ 100 — exactly the
    non-degenerate regime — and staying finite with bounded grads beyond.
    With ``clamp=False`` it is plain ``F.binary_cross_entropy_with_logits``
    (the reference's binary graph/node-classification loss,
    src/finetune/finetune.py:153), which torch does NOT clamp.
    """
    yf = y.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    per = jnp.maximum(zf, 0.0) - zf * yf + jnp.log1p(jnp.exp(-jnp.abs(zf)))
    return jnp.minimum(per, -_LOG_CLAMP) if clamp else per


def masked_bce_with_logits_mean(z: jnp.ndarray, y: jnp.ndarray,
                                mask: jnp.ndarray) -> jnp.ndarray:
    """Mask-weighted mean of ``bce_with_logits`` (sum/valid-count)."""
    per = bce_with_logits(z, y)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
