"""Model library: flax modules with torch-parity semantics on padded batches."""

from gnn_pretraining_tpu.models.norm import MaskedBatchNorm
from gnn_pretraining_tpu.models.gnn import InputEncoder, GINLayer, GINBackbone
from gnn_pretraining_tpu.models.heads import (
    MLPHead,
    MLPLinkPredictor,
    DomainClassifierHead,
    grad_reverse,
)
from gnn_pretraining_tpu.models.pretrain_model import PretrainableGNN
from gnn_pretraining_tpu.models.finetune_model import (
    FinetuneGNN,
    load_pretrained_into_finetune,
)
