"""Multi-chip SPMD: meshes, edge-partitioned aggregation, data-parallel
steps, and GSPMD tensor parallelism for the backbone MLPs."""

from gnn_pretraining_tpu.parallel.mesh import make_mesh
from gnn_pretraining_tpu.parallel.edge_partition import (
    edge_partitioned_aggregate,
    shard_edges,
)
from gnn_pretraining_tpu.parallel.tensor_parallel import (
    make_tp_mesh,
    shard_variables,
    tp_specs,
)
