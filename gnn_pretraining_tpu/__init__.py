"""gnn_pretraining_tpu — a TPU-native multi-task GNN pretraining framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo `alonbebchuk/GNN-Pretraining` (multi-task GIN pretraining over molecule
and citation-graph domains, with fine-tuning / linear probing on 6 downstream
domains).

Design pillars (TPU-first, not a port):
  * Static shapes everywhere: graphs live in padded, masked ``GraphBatch``
    pytrees; augmentation = masking, never re-batching.
  * Neighborhood aggregation is MXU-native: batched graphs use a dense
    adjacency matmul (Pallas tiled SpMM kernel with a custom VJP), with a
    COO segment-sum fallback; there is no scatter-add hot loop.
  * One jit-compiled train step per scheme: all task losses, PCGrad
    projections, loss balancing, clipping and the optimizer run on-device.
  * Multi-chip via ``jax.sharding.Mesh`` + ``shard_map``: data-parallel graph
    sharding and edge-partitioned aggregation with ``psum`` combines.
"""

__version__ = "0.1.0"
