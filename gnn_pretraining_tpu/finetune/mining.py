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
from gnn_pretraining_tpu.ops.sddmm import cosine_similarity_matrix, l2_normalize
from gnn_pretraining_tpu.ops.topk import exact_top_k


def candidate_count(num_nodes: int, train_edges,
                    num_real_nodes: int | None = None) -> int:
    """Number of candidate (ordered, non-self, non-edge) pairs — static.

    ``num_real_nodes`` (≤ ``num_nodes``) counts only un-padded rows: the
    reference mines over the real graph (finetune.py:47-48), so pairs that
    touch a padding row are not candidates.
    """
    import numpy as np

    n = num_nodes if num_real_nodes is None else num_real_nodes
    te = np.asarray(train_edges)
    pairs = {(int(u), int(v)) for u, v in te.T}
    pairs |= {(v, u) for u, v in pairs}
    pairs -= {(u, u) for u, _ in pairs}
    off_diag_links = len(pairs)
    return n * n - n - off_diag_links


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
    if n >= config.STREAMING_MINER_MIN_NODES:
        return mine_hard_negatives_streaming(embeddings, forbidden, key,
                                             num_negatives=num_negatives,
                                             num_hard=num_hard)
    sim = cosine_similarity_matrix(embeddings)
    allowed = ~forbidden
    masked = jnp.where(allowed, sim, -jnp.inf).reshape(-1)

    _, hard_idx = exact_top_k(masked, num_hard)

    num_rand = num_negatives - num_hard
    if num_rand > 0:
        # Uniform without replacement over allowed minus hard: Gumbel top-k.
        # Both orientations of each hard pair leave the pool, as in the
        # reference (finetune.py:84-86 clears [src,dst] AND [dst,src]).
        gumbel = jax.random.gumbel(key, (n * n,))
        rev_idx = (hard_idx % n) * n + hard_idx // n
        avail = (allowed.reshape(-1).at[hard_idx].set(False)
                 .at[rev_idx].set(False))
        _, rand_idx = exact_top_k(jnp.where(avail, gumbel, -jnp.inf), num_rand)
        idx = jnp.concatenate([hard_idx, rand_idx])
    else:
        idx = hard_idx

    return (idx // n).astype(jnp.int32), (idx % n).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("num_negatives", "num_hard", "row_block"))
def mine_hard_negatives_streaming(embeddings: jnp.ndarray,
                                  forbidden: jnp.ndarray, key: jax.Array,
                                  num_negatives: int, num_hard: int,
                                  row_block: int = 512
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused masked-SDDMM + top-k miner that never materializes [N, N].

    Streams row blocks of the cosine-similarity matrix (``lax.map`` compiles
    the block body once): each step computes one [row_block, N] masked SDDMM
    tile on the MXU and immediately reduces it to its top-``num_hard``
    entries, so peak memory is O(row_block·N) instead of O(N²). Every global
    winner is a winner of its own block, so the hard set is exact — identical
    to the dense path's ``exact_top_k`` over the full matrix.

    The uniform remainder also streams: per-block Gumbel noise over *allowed*
    slots (hard slots included), a global top-(``num_rand + 2·num_hard``)
    candidate pool, then collisions with the hard set — either orientation,
    as in the reference (finetune.py:84-86) — are dropped and the first
    ``num_rand`` survivors kept. Ranking i.i.d. Gumbels is a uniform random
    permutation, and deleting elements from a uniform permutation leaves a
    uniform permutation of the rest, so this is distributed exactly as the
    dense path's Gumbel top-k over allowed-minus-hard-and-reverses (the
    sampled set differs per key, the distribution does not). At most
    ``2·num_hard`` of the candidates can collide, so ≥ ``num_rand`` always
    survive.

    Not a Mosaic in-kernel top-k by design: TPU Pallas has no sort/top-k
    primitive, and an iterative max-and-suppress loop over each tile would be
    VPU-bound at O(k·block·N) — strictly slower than letting XLA fuse the
    mask into the matmul epilogue and sort [row_block·N] winners per block.
    """
    n = embeddings.shape[0]
    z = l2_normalize(embeddings)
    nb = -(-n // row_block)
    pad = nb * row_block - n
    zp = jnp.pad(z, ((0, pad), (0, 0)))
    fp = jnp.pad(forbidden, ((0, pad), (0, 0)), constant_values=True)
    num_rand = num_negatives - num_hard
    num_cand = num_rand + 2 * num_hard
    kk = min(num_hard, row_block * n)
    gk = min(num_cand, row_block * n)

    # Winners carry (value, block-local index); the local index stays below
    # row_block·n so everything fits int32 regardless of how large N² gets.
    def block(i):
        zb = jax.lax.dynamic_slice_in_dim(zp, i * row_block, row_block)
        fb = jax.lax.dynamic_slice_in_dim(fp, i * row_block, row_block)
        sim = jnp.dot(zb, z.T, preferred_element_type=jnp.float32)
        sim = jnp.where(fb, -jnp.inf, sim).reshape(-1)
        out = jax.lax.top_k(sim, kk)
        if num_rand > 0:
            gum = jax.random.gumbel(jax.random.fold_in(key, i),
                                    (row_block * n,))
            gum = jnp.where(fb.reshape(-1), -jnp.inf, gum)
            out += jax.lax.top_k(gum, gk)
        return out

    res = jax.lax.map(block, jnp.arange(nb, dtype=jnp.int32))

    def decode(flat_sel, local, per_block):
        """[nb, per_block] winners → global (row, col) of flat selections."""
        blk = flat_sel // per_block
        loc = local.reshape(-1)[flat_sel]
        return blk * row_block + loc // n, loc % n

    _, sel = jax.lax.top_k(res[0].reshape(-1), num_hard)
    hr, hc = decode(sel, res[1], kk)

    if num_rand > 0:
        _, gsel = jax.lax.top_k(res[2].reshape(-1), num_cand)
        rr, rc = decode(gsel, res[3], gk)        # sorted by Gumbel, descending
        collide = jnp.any(((rr[:, None] == hr[None, :])
                           & (rc[:, None] == hc[None, :]))
                          | ((rr[:, None] == hc[None, :])
                             & (rc[:, None] == hr[None, :])), axis=1)
        keep = jnp.argsort(collide.astype(jnp.int32), stable=True)[:num_rand]
        rows = jnp.concatenate([hr, rr[keep]])
        cols = jnp.concatenate([hc, rc[keep]])
    else:
        rows, cols = hr, hc

    return rows.astype(jnp.int32), cols.astype(jnp.int32)


def hard_count(num_candidates: int, num_negatives: int) -> int:
    """Static replica of the reference's num_hard formula (:69-70)."""
    nh = max(config.MIN_HARD_NEGATIVES,
             int(num_candidates * config.HARD_NEGATIVE_RATIO))
    return min(nh, num_candidates, num_negatives)


def build_forbidden_mask(num_nodes: int, train_edges,
                         node_mask=None) -> jnp.ndarray:
    """[N, N] bool: undirected train edges + diagonal (reference :53-59).

    ``node_mask`` ([N] 0/1, optional) marks real rows of a padded batch;
    pairs touching a padding row are forbidden too — the reference mines
    over the real graph only, and padding embeddings (exactly zero after
    masked BN) would otherwise enter the candidate pool.
    """
    import numpy as np

    m = np.zeros((num_nodes, num_nodes), bool)
    te = np.asarray(train_edges)
    if te.size:
        m[te[0], te[1]] = True
        m[te[1], te[0]] = True
    np.fill_diagonal(m, True)
    if node_mask is not None:
        pad = np.asarray(node_mask) == 0
        m[pad, :] = True
        m[:, pad] = True
    return jnp.asarray(m)
