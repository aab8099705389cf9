"""Multi-chip SPMD: meshes, edge-partitioned aggregation, data-parallel steps."""

from gnn_pretraining_tpu.parallel.mesh import make_mesh
from gnn_pretraining_tpu.parallel.edge_partition import (
    edge_partitioned_aggregate,
    shard_edges,
)
