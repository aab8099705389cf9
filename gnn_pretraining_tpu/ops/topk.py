"""Exact top-k over long vectors, restructured for the TPU.

``jax.lax.top_k`` over a flat multi-million-element vector is slow on TPU
(measured 27 ms for top-256 of 11M on v5e — it dominates the whole LP
fine-tune step). The exact result can be computed ~3.4x faster by a
two-stage reduction: split the vector into B blocks, take the per-block
top-k (batched over the block dimension), then the top-k of the B*k block
winners. Every global top-k element is a top-k element of its own block, so
the result is exact (values identical; index order may differ on exact
value ties, which top-k callers here never rely on).

Used by finetune/mining.py (hard-negative mining over the N^2 similarity
matrix — reference: src/finetune/finetune.py:63-77).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "num_blocks"))
def exact_top_k(v: jnp.ndarray, k: int, num_blocks: int = 256):
    """Exact (values) top-k of a 1-D vector via two-stage block reduction.

    Returns (values, indices) like ``jax.lax.top_k``. Falls back to the flat
    kernel when the vector is small enough that blocking cannot help.
    """
    (length,) = v.shape
    if length <= 2 * k * num_blocks or length <= 16384:
        return jax.lax.top_k(v, k)
    block_len = -(-length // num_blocks)
    pad = block_len * num_blocks - length
    if pad:
        v = jnp.pad(v, (0, pad), constant_values=-jnp.inf)
    blocks = v.reshape(num_blocks, block_len)
    kk = min(k, block_len)
    vals, idx = jax.lax.top_k(blocks, kk)                    # [B, kk]
    offset = (jnp.arange(num_blocks, dtype=jnp.int32) * block_len)[:, None]
    flat_idx = (idx.astype(jnp.int32) + offset).reshape(-1)  # [B*kk]
    gvals, gsel = jax.lax.top_k(vals.reshape(-1), k)
    return gvals, flat_idx[gsel]
