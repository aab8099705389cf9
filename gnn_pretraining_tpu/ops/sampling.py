"""Static-shape random selection primitives.

jit-compatible replacements for the reference's dynamic-shape sampling:

  * ``masked_randperm_select`` — per-graph "randperm[:k]" selection as a boolean
    mask (reference: node masking at src/models/pretrain_model.py:77-80,
    node/edge drops at src/pretrain/augmentations.py:36-54).
  * ``batched_negative_sampling`` — per-graph uniform non-edge sampling with
    fixed-round rejection against the dense undirected adjacency (reference:
    PyG ``batched_negative_sampling``, src/pretrain/tasks.py:107-111).

All outputs have static shapes; validity is carried in masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_pretraining_tpu import config

def masked_randperm_select(key: jax.Array, group_ids: jnp.ndarray,
                           row_mask: jnp.ndarray,
                           num_select: jnp.ndarray) -> jnp.ndarray:
    """Select ``num_select[g]`` uniformly-random valid rows from each group.

    Equivalent to an independent ``randperm(n_g)[:k_g]`` per group, expressed
    as a boolean mask over the padded row axis.

    Args:
      key: PRNG key.
      group_ids: [R] int group id per row (values in [0, G)); padding rows may
        carry any id but must have ``row_mask == False``.
      row_mask: [R] bool validity.
      num_select: [G] int number of rows to select per group.

    Returns:
      [R] bool selection mask (subset of ``row_mask``).
    """
    r = group_ids.shape[0]
    score = jax.random.uniform(key, (r,))
    # Composite sort key: (valid desc, group asc, score asc). Invalid rows sink
    # to the back. group_ids fit in small ints, score in [0,1).
    sort_key = jnp.where(row_mask.astype(bool),
                         group_ids.astype(jnp.float32) * 2.0 + score,
                         jnp.float32(1e9))
    order = jnp.argsort(sort_key)
    inv = jnp.zeros(r, jnp.int32).at[order].set(jnp.arange(r, dtype=jnp.int32))

    # Start position of each group in the sorted order = cumulative counts of
    # valid rows in preceding groups.
    num_groups = num_select.shape[0]
    counts = jax.ops.segment_sum(row_mask.astype(jnp.int32),
                                 jnp.clip(group_ids, 0, num_groups - 1),
                                 num_segments=num_groups)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    rank = inv - starts[jnp.clip(group_ids, 0, num_groups - 1)]
    selected = (rank < num_select[jnp.clip(group_ids, 0, num_groups - 1)]) & row_mask.astype(bool)
    return selected


def batched_negative_sampling(key: jax.Array,
                              undirected_adj: jnp.ndarray,
                              edge_graph: jnp.ndarray,
                              edge_mask: jnp.ndarray,
                              node_start: jnp.ndarray,
                              n_node: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample one negative (non-edge, non-self) node pair per positive edge slot.

    Per-graph uniform sampling over ordered pairs, rejecting self-loops and
    existing undirected edges for a fixed number of rounds. Matches the
    semantics of PyG ``batched_negative_sampling(to_undirected(E), batch,
    num_neg=|E|)`` (reference: src/pretrain/tasks.py:107-111): negatives stay
    inside their source graph and avoid true edges (up to the vanishingly rare
    case of every rejection round colliding on a dense graph).

    Args:
      key: PRNG key.
      undirected_adj: [N, N] float/bool, nonzero where an (undirected) edge
        exists between global node ids.
      edge_graph: [E] graph id of each positive edge slot.
      edge_mask: [E] validity of each slot.
      node_start: [G] first global node id of each graph.
      n_node: [G] valid node count of each graph.

    Returns:
      (neg_senders, neg_receivers): [E] global node ids; padding slots mirror
      ``edge_mask`` and point at node_start of their graph.
    """
    e = edge_graph.shape[0]
    g_start = node_start[edge_graph]
    g_size = jnp.maximum(n_node[edge_graph], 1)

    is_edge = undirected_adj > 0

    def sample_pair(k):
        ku, kv = jax.random.split(k)
        u = g_start + (jax.random.uniform(ku, (e,)) * g_size).astype(jnp.int32)
        v = g_start + (jax.random.uniform(kv, (e,)) * g_size).astype(jnp.int32)
        return u, v

    def bad(u, v):
        return (u == v) | is_edge[u, v]

    keys = jax.random.split(key, config.NEG_SAMPLING_ROUNDS + 1)
    u, v = sample_pair(keys[0])
    need = bad(u, v)
    for r in range(1, config.NEG_SAMPLING_ROUNDS):
        nu, nv = sample_pair(keys[r])
        u = jnp.where(need, nu, u)
        v = jnp.where(need, nv, v)
        need = need & bad(u, v)

    # Last-resort fallback: guarantee no self-loop (possibly a true edge, with
    # probability ~ (E_g / n_g^2)^ROUNDS).
    off = 1 + (jax.random.uniform(keys[-1], (e,)) * jnp.maximum(g_size - 1, 1)).astype(jnp.int32)
    v_fb = g_start + (u - g_start + off) % g_size
    v = jnp.where(need & (g_size > 1), v_fb, v)

    u = jnp.where(edge_mask.astype(bool), u, g_start)
    v = jnp.where(edge_mask.astype(bool), v, g_start)
    return u, v
