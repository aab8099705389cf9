"""Edge-partitioned message passing: the GNN analogue of sequence parallelism.

The reference has no distributed machinery at all (SURVEY.md §2.6); the
scaling axis for this workload is edge count. Design (SURVEY.md §5
"long-context counterpart", BASELINE.json north star):

  * shard a graph's COO edge list across the ``edge`` mesh axis;
  * each device gathers its senders' features from the (replicated) node
    array and computes a *partial* aggregation over its local edges with the
    same masked ``segment_sum`` used on one chip;
  * partials are combined with one ``psum`` over ICI — exact, because
    neighborhood aggregation is additive over edges;
  * the ``(1+eps)·h`` term is added once after the combine.

Under ``jax.grad``, the transpose of ``psum`` + gather yields the correct
edge-partitioned backward (scatter of cotangents over local edges followed by
the replicated-sum transpose), so fwd+bwd both scale with |E|/n_devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gnn_pretraining_tpu.data.batch import round_up


def shard_edges(senders, receivers, edge_mask, n_shards: int):
    """Pad the edge list to a multiple of ``n_shards`` (host-side)."""
    import numpy as np

    e = senders.shape[0]
    e_pad = round_up(e, n_shards)
    pad = e_pad - e
    if pad:
        senders = np.pad(np.asarray(senders), (0, pad))
        receivers = np.pad(np.asarray(receivers), (0, pad))
        edge_mask = np.pad(np.asarray(edge_mask), (0, pad))
    return senders, receivers, edge_mask


def edge_partitioned_aggregate(mesh: Mesh, h: jnp.ndarray, senders: jnp.ndarray,
                               receivers: jnp.ndarray, edge_mask: jnp.ndarray,
                               eps: jnp.ndarray) -> jnp.ndarray:
    """``Σ_{j∈N(i)} h_j + (1+eps) h`` with edges sharded over mesh axis 'edge'."""
    n = h.shape[0]

    def local_agg(h_rep, s_loc, r_loc, m_loc, eps_rep):
        msgs = h_rep[s_loc] * m_loc.astype(h_rep.dtype)[:, None]
        partial = jax.ops.segment_sum(msgs, r_loc, num_segments=n)
        total = jax.lax.psum(partial, axis_name="edge")
        return total + (1.0 + eps_rep) * h_rep

    fn = shard_map(
        local_agg, mesh=mesh,
        in_specs=(P(), P("edge"), P("edge"), P("edge"), P()),
        out_specs=P(), check_vma=False)
    return fn(h, senders, receivers, edge_mask, jnp.asarray(eps, jnp.float32))


def make_edge_partitioned_gin_fn(mesh: Mesh):
    """Aggregation callable with the ops/spmm.py signature, bound to a mesh."""

    def agg(h, senders, receivers, edge_mask, eps):
        return edge_partitioned_aggregate(mesh, h, senders, receivers,
                                          edge_mask, eps)

    return agg
