"""Masked segment reductions (XLA-native).

These replace PyG's ``global_mean_pool`` / ``global_max_pool`` (reference:
src/pretrain/tasks.py:241-247, src/models/finetune_model.py:75) for padded
graph batches. Padding rows carry ``mask == 0`` and a segment id pointing at a
trash segment, so all shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum rows of ``data`` into ``num_segments`` buckets; masked rows contribute 0."""
    if mask is not None:
        data = data * mask.astype(data.dtype)[..., None]
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids: jnp.ndarray, num_segments: int,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask.astype(jnp.float32)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-segment mean over valid rows (== torch_geometric global_mean_pool)."""
    sums = segment_sum(data, segment_ids, num_segments, mask)
    counts = segment_count(segment_ids, num_segments, mask)
    return sums / jnp.maximum(counts, 1.0)[..., None]


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-segment max over valid rows (== global_max_pool). Empty segments -> 0."""
    if mask is not None:
        data = jnp.where(mask.astype(bool)[..., None], data, _NEG_INF)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # Segments with no valid rows come out as -inf-ish; zero them like an
    # empty pool (never consumed downstream because graph_mask gates them).
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def segment_softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       row_mask: jnp.ndarray | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise softmax cross-entropy with sum reduction over valid rows.

    Matches ``F.cross_entropy(logits, labels, reduction='sum')`` over rows where
    ``row_mask`` is set (reference: src/pretrain/tasks.py:211). ``logits`` may
    contain ``-inf`` entries (masked similarity columns); they are handled by
    the standard max-subtraction log-sum-exp.
    """
    if row_mask is not None:
        # Sanitize masked rows so all-(-inf) rows cannot produce NaNs that
        # would leak through the masked sum (0 * NaN == NaN).
        logits = jnp.where(row_mask.astype(bool)[:, None], logits, 0.0)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - jax.lax.stop_gradient(row_max)
    log_z = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    label_logit = jnp.take_along_axis(shifted, labels[:, None], axis=-1)[:, 0]
    losses = log_z - label_logit
    if row_mask is not None:
        losses = losses * row_mask.astype(losses.dtype)
        n = jnp.sum(row_mask.astype(jnp.float32))
    else:
        n = jnp.asarray(losses.shape[0], jnp.float32)
    return jnp.sum(losses), n
