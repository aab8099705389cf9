"""Link-prediction hard-negative mining on the MXU.

Behavioural port of ``LinkPredictionHardNegativeMiner``
(src/finetune/finetune.py:45-106): cosine-similarity matrix over node
embeddings; candidates exclude existing (undirected) train edges and the
diagonal; ``num_hard = min(max(8, ⌊0.3·P⌋), P, num_negatives)`` most-similar
candidates are taken, the remainder sampled uniformly from the rest. All
counts are static Python ints (N, train-edge count, and batch size are fixed
per dataset), so the whole miner jits with fixed shapes; uniform
without-replacement sampling uses Gumbel top-k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.ops.sddmm import cosine_similarity_matrix
from gnn_pretraining_tpu.ops.topk import exact_top_k


def candidate_count(num_nodes: int, train_edges) -> int:
    """Number of candidate (ordered, non-self, non-edge) pairs — static."""
    import numpy as np

    te = np.asarray(train_edges)
    pairs = {(int(u), int(v)) for u, v in te.T}
    pairs |= {(v, u) for u, v in pairs}
    pairs -= {(u, u) for u, _ in pairs}
    off_diag_links = len(pairs)
    return num_nodes * num_nodes - num_nodes - off_diag_links


@functools.partial(jax.jit, static_argnames=("num_negatives", "num_hard"))
def mine_hard_negatives(embeddings: jnp.ndarray, forbidden: jnp.ndarray,
                        key: jax.Array, num_negatives: int, num_hard: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``num_hard`` most-similar allowed pairs + uniform rest.

    Args:
      embeddings: [N, H] node embeddings (no-grad, train-edge propagation).
      forbidden: [N, N] bool — True at existing undirected edges + diagonal.
      num_negatives: total negatives to return (static).
      num_hard: static hard count (use ``hard_count`` helper).

    Returns:
      (senders, receivers): [num_negatives] global node ids.
    """
    n = embeddings.shape[0]
    sim = cosine_similarity_matrix(embeddings)
    allowed = ~forbidden
    masked = jnp.where(allowed, sim, -jnp.inf).reshape(-1)

    _, hard_idx = exact_top_k(masked, num_hard)

    num_rand = num_negatives - num_hard
    if num_rand > 0:
        # Uniform without replacement over allowed minus hard: Gumbel top-k.
        gumbel = jax.random.gumbel(key, (n * n,))
        avail = allowed.reshape(-1).at[hard_idx].set(False)
        _, rand_idx = exact_top_k(jnp.where(avail, gumbel, -jnp.inf), num_rand)
        idx = jnp.concatenate([hard_idx, rand_idx])
    else:
        idx = hard_idx

    return (idx // n).astype(jnp.int32), (idx % n).astype(jnp.int32)


def hard_count(num_candidates: int, num_negatives: int) -> int:
    """Static replica of the reference's num_hard formula (:69-70)."""
    nh = max(config.MIN_HARD_NEGATIVES,
             int(num_candidates * config.HARD_NEGATIVE_RATIO))
    return min(nh, num_candidates, num_negatives)


def build_forbidden_mask(num_nodes: int, train_edges) -> jnp.ndarray:
    """[N, N] bool: undirected train edges + diagonal (reference :53-59)."""
    import numpy as np

    m = np.zeros((num_nodes, num_nodes), bool)
    te = np.asarray(train_edges)
    if te.size:
        m[te[0], te[1]] = True
        m[te[1], te[0]] = True
    np.fill_diagonal(m, True)
    return jnp.asarray(m)
