"""TPU-native compute kernels: segment reductions, SpMM, SDDMM, sampling."""

from gnn_pretraining_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax_ce,
)
from gnn_pretraining_tpu.ops.spmm import (
    build_dense_adjacency,
    gin_aggregate_coo,
    gin_aggregate_dense,
    gin_aggregate,
    spmm_pallas,
)
from gnn_pretraining_tpu.ops.spmm_csr import (
    BlockCSR,
    build_block_csr,
    gin_aggregate_csr,
    spmm_csr,
)
from gnn_pretraining_tpu.ops.sddmm import (
    cosine_similarity_matrix,
    nt_xent_loss,
)
from gnn_pretraining_tpu.ops.sampling import (
    batched_negative_sampling,
    masked_randperm_select,
)
