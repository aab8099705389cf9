"""Runtime utilities: metric sink, checkpointing, profiling."""

from gnn_pretraining_tpu.utils.logging import MetricLogger
from gnn_pretraining_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
)
