"""PCGrad gradient surgery as vectorized per-tensor projections.

Behavioural port of src/pretrain/gradient_surgery.py:41-103. Reference
semantics preserved:

  * task order shuffled per step (``random.shuffle`` → PRNG permutation);
  * task i's gradient is projected against the *original* gradients of every
    earlier task j in the shuffled order, per parameter tensor, only when
    ⟨g_i, g_j⟩ < 0 and both norms are nonzero;
  * final gradient per parameter = mean over the tasks that produce a gradient
    for it. The reference's "param in task's grad dict" membership (torch
    backward leaves untouched params at grad=None) is reproduced with static
    participation masks derived from the model structure: task heads belong to
    their task; the mask token to NFM; the input encoders to every task except
    NFM (whose encode runs under no_grad, pretrain_model.py:68); the backbone
    to all;
  * emits total_conflicts / total_projections / conflict_ratio.

TPU-first design: instead of looping per parameter tensor (hundreds of tiny
XLA ops → minutes of compile time), all leaves are raveled into one flat
vector per task. The flat layout pads every leaf to a multiple of a fixed
block size and views the vector as [num_blocks, block]: a per-tensor dot
product is then a row-sum over blocks followed by one tiny static
block→leaf matmul on the MXU, and a projection is one fused elementwise
pass — O(K²) vector ops total, independent of parameter count, with **no
scatter**. (A first version used element-level ``jax.ops.segment_sum``;
TPU lowers that to a serialized scatter-add over every parameter, which at
~2M parameters cost ~150 ms per step — 30× the cost of computing all the
task gradients themselves.)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def task_participates(top_key: str, task: str) -> bool:
    """Whether a top-level param subtree receives gradients from ``task``."""
    if top_key.startswith("heads_"):
        return top_key == f"heads_{task}" or top_key.startswith(f"heads_{task}_")
    if top_key == "mask_token":
        return task == "node_feat_mask"
    if top_key.startswith("input_encoders"):
        return task != "node_feat_mask"  # NFM encodes under stop_gradient
    return True  # gnn_backbone and anything shared


_BLOCK = 512  # lane-friendly block; every leaf padded to a multiple of it


def _padded_flatten(tree) -> Tuple[jnp.ndarray, List[Tuple[int, ...]]]:
    """Ravel leaves into one vector, each leaf zero-padded to _BLOCK."""
    leaves = jax.tree.leaves(tree)
    parts = []
    for l in leaves:
        v = jnp.ravel(l)
        pad = (-v.size) % _BLOCK
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
        parts.append(v)
    return jnp.concatenate(parts), [l.shape for l in leaves]


def _block_leaf_ids(shapes: List[Tuple[int, ...]]) -> np.ndarray:
    """Leaf id of each _BLOCK-sized block in the padded flat layout."""
    nblocks = [(int(np.prod(s) if s else 1) + _BLOCK - 1) // _BLOCK
               for s in shapes]
    return np.repeat(np.arange(len(shapes)), nblocks).astype(np.int32)


def _leaf_top_keys(tree) -> List[str]:
    """Top-level key owning each leaf, in jax.tree.leaves order."""
    keys = []
    for top_key in sorted(tree.keys()):
        n = len(jax.tree.leaves(tree[top_key]))
        keys.extend([top_key] * n)
    return keys


def apply_pcgrad(task_grads: Dict[str, dict], key: jax.Array
                 ) -> Tuple[dict, Dict[str, jnp.ndarray]]:
    """Combine per-task gradient pytrees with PCGrad (see module docstring)."""
    task_names = list(task_grads.keys())
    k = len(task_names)
    if k <= 1:
        (only,) = task_grads.values()
        return only, {}

    treedef = jax.tree.structure(task_grads[task_names[0]])
    flats = []
    shapes = None
    for t in task_names:
        f, shapes = _padded_flatten(task_grads[t])
        flats.append(f)
    flat_g = jnp.stack(flats)                      # [K, P'] blocked layout

    blk_ids = _block_leaf_ids(shapes)              # [B] static, sorted
    num_leaves = len(shapes)
    num_blocks = len(blk_ids)
    # Static block→leaf 0/1 matrix: per-leaf reduction = one tiny matmul
    # ([L, B] @ [B] on the MXU) instead of a serialized scatter-add.
    blk_onehot = jnp.asarray(
        (blk_ids[None, :] == np.arange(num_leaves)[:, None])
        .astype(np.float32))                       # [L, B]
    blk_ids = jnp.asarray(blk_ids)
    top_keys = _leaf_top_keys(task_grads[task_names[0]])
    part = jnp.asarray(np.array(
        [[float(task_participates(top_keys[l], t)) for l in range(num_leaves)]
         for t in task_names], np.float32))        # [K, L]

    # Shuffled task order (reference :42-43).
    perm = jax.random.permutation(key, k)
    g_orig = flat_g[perm].reshape(k, num_blocks, _BLOCK)   # [K, B, T]
    part_p = part[perm]            # [K, L]

    def leaf_dot(a, b):
        """Per-leaf dot of two blocked vectors: [B,T]·[B,T] → [L]."""
        partial = jnp.sum(a * b, axis=-1)          # [B]
        # HIGHEST precision: these feed sign tests (conflict decisions).
        return jnp.matmul(blk_onehot, partial,
                          precision=jax.lax.Precision.HIGHEST)

    modified = [g_orig[i] for i in range(k)]
    conflicts = jnp.zeros(())
    projections = jnp.zeros(())
    for i in range(k):
        for j in range(i):
            gi, gj = modified[i], g_orig[j]
            dot = leaf_dot(gi, gj)          # [L]
            ni2 = leaf_dot(gi, gi)
            nj2 = leaf_dot(gj, gj)
            valid = (ni2 > 0) & (nj2 > 0)
            conflict = valid & (dot < 0)
            coef = jnp.where(conflict, dot / jnp.where(nj2 > 0, nj2, 1.0), 0.0)
            modified[i] = gi - coef[blk_ids][:, None] * gj
            conflicts += jnp.sum(conflict)
            projections += jnp.sum(valid)

    # Mean over participating tasks per leaf (reference :60-68).
    denom = jnp.maximum(jnp.sum(part_p, axis=0), 1.0)      # [L]
    acc = sum(modified[i] * part_p[i][blk_ids][:, None] for i in range(k))
    combined_flat = (acc / denom[blk_ids][:, None]).reshape(-1)

    # Unflatten back to the grads pytree (slices skip the per-leaf padding).
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    padded = [(s + _BLOCK - 1) // _BLOCK * _BLOCK for s in sizes]
    offsets = np.concatenate([[0], np.cumsum(padded)])
    leaves = [combined_flat[offsets[l]:offsets[l] + sizes[l]].reshape(shapes[l])
              for l in range(num_leaves)]
    combined = jax.tree.unflatten(treedef, leaves)

    metrics = {
        "gradient_surgery/total_conflicts": conflicts,
        "gradient_surgery/total_projections": projections,
        "gradient_surgery/conflict_ratio":
            conflicts / jnp.maximum(projections, 1.0),
    }
    return combined, metrics
