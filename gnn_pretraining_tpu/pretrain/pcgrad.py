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
vector per task with a static leaf-id segment map. A per-tensor dot product is
then one ``segment_sum`` over the flat product, and a projection is one fused
elementwise pass — O(K²) vector ops total, independent of parameter count.
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


def _flatten(tree) -> Tuple[jnp.ndarray, List, List[Tuple[int, ...]]]:
    leaves = jax.tree.leaves(tree)
    flat = jnp.concatenate([jnp.ravel(l) for l in leaves])
    shapes = [l.shape for l in leaves]
    return flat, leaves, shapes


def _leaf_ids(shapes: List[Tuple[int, ...]]) -> np.ndarray:
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    return np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)


def _leaf_top_keys(tree) -> List[str]:
    """Top-level key owning each leaf, in jax.tree.leaves order."""
    keys = []
    for top_key in sorted(tree.keys()):
        n = len(jax.tree.leaves(tree[top_key]))
        keys.extend([top_key] * n)
    return keys


def apply_pcgrad(task_grads: Dict[str, dict], params_template, key: jax.Array
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
        f, _, shapes = _flatten(task_grads[t])
        flats.append(f)
    flat_g = jnp.stack(flats)  # [K, P]

    leaf_ids = jnp.asarray(_leaf_ids(shapes))      # [P] static
    num_leaves = len(shapes)
    top_keys = _leaf_top_keys(task_grads[task_names[0]])
    part = jnp.asarray(np.array(
        [[float(task_participates(top_keys[l], t)) for l in range(num_leaves)]
         for t in task_names], np.float32))        # [K, L]

    # Shuffled task order (reference :42-43).
    perm = jax.random.permutation(key, k)
    g_orig = flat_g[perm]          # [K, P] in shuffled order
    part_p = part[perm]            # [K, L]

    def leaf_dot(a, b):
        return jax.ops.segment_sum(a * b, leaf_ids, num_segments=num_leaves)

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
            modified[i] = gi - coef[leaf_ids] * gj
            conflicts += jnp.sum(conflict)
            projections += jnp.sum(valid)

    # Mean over participating tasks per leaf (reference :60-68).
    denom = jnp.maximum(jnp.sum(part_p, axis=0), 1.0)      # [L]
    acc = sum(modified[i] * part_p[i][leaf_ids] for i in range(k))
    combined_flat = acc / denom[leaf_ids]

    # Unflatten back to the grads pytree.
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    leaves = [combined_flat[offsets[l]:offsets[l + 1]].reshape(shapes[l])
              for l in range(num_leaves)]
    combined = jax.tree.unflatten(treedef, leaves)

    metrics = {
        "gradient_surgery/total_conflicts": conflicts,
        "gradient_surgery/total_projections": projections,
        "gradient_surgery/conflict_ratio":
            conflicts / jnp.maximum(projections, 1.0),
    }
    return combined, metrics
