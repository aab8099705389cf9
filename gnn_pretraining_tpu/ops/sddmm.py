"""Dense similarity (SDDMM-style) ops and the fused NT-Xent contrastive loss.

Replaces the reference's ``z @ z.T`` similarity matrices and
``_simclr_nt_xent`` (reference: src/pretrain/tasks.py:192-213, 265-287) with
masked, static-shape equivalents. The similarity matrix is a plain MXU matmul;
the loss fuses masking, diagonal suppression and softmax cross-entropy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_pretraining_tpu.ops.segment import segment_softmax_ce

_L2_NORM_EPS = 1e-12  # torch F.normalize default eps
_MASKED_LOGIT = -1e30


def l2_normalize(z: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Row-normalize like ``F.normalize(z, dim=1)`` (eps=1e-12, clamped norm)."""
    norm = jnp.linalg.norm(z, axis=axis, keepdims=True)
    return z / jnp.maximum(norm, _L2_NORM_EPS)


def cosine_similarity_matrix(a: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cosine similarity a_i · b_j over L2-normalized rows (MXU matmul)."""
    a = l2_normalize(a)
    b = a if b is None else l2_normalize(b)
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


def nt_xent_loss(z1: jnp.ndarray, z2: jnp.ndarray, temperature: jnp.ndarray,
                 valid: jnp.ndarray,
                 axis_name: str | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SimCLR NT-Xent over padded pair batches; returns (sum_loss, num_rows).

    Matches the reference semantics exactly on the valid rows
    (src/pretrain/tasks.py:192-213): rows = [z1; z2], similarity = normalized
    dot / τ with the diagonal masked out, positives at offset N, cross-entropy
    with sum reduction over the 2N valid rows. ``valid`` is the shared row
    validity of z1/z2 (pairs occupy the same slots in both views).

    With ``axis_name`` (data-parallel shard_map), rows are ``all_gather``ed
    over that mesh axis first, so every device computes the loss over the
    *global* pair set — negatives span the whole batch exactly as on one chip.
    """
    if axis_name is not None:
        z1 = jax.lax.all_gather(z1, axis_name, tiled=True)
        z2 = jax.lax.all_gather(z2, axis_name, tiled=True)
        valid = jax.lax.all_gather(valid, axis_name, tiled=True)
    n = z1.shape[0]
    z = jnp.concatenate([l2_normalize(z1), l2_normalize(z2)], axis=0)
    vv = jnp.concatenate([valid, valid], axis=0).astype(bool)

    sim = jnp.dot(z, z.T, preferred_element_type=jnp.float32) / temperature
    diag = jnp.eye(2 * n, dtype=bool)
    col_invalid = ~vv[None, :]
    sim = jnp.where(diag | col_invalid, _MASKED_LOGIT, sim)

    labels = jnp.concatenate(
        [jnp.arange(n, 2 * n, dtype=jnp.int32), jnp.arange(0, n, dtype=jnp.int32)])
    loss_sum, num_rows = segment_softmax_ce(sim, labels, row_mask=vv)
    return loss_sum, num_rows
