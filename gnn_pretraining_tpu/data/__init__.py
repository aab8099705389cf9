"""Data layer: device-resident padded graph batches, parsers, preprocessing."""

from gnn_pretraining_tpu.data.batch import GraphBatch, GraphStore, pad_to
from gnn_pretraining_tpu.data.loaders import (
    BalancedMultiDomainSampler,
    create_pretrain_train_loader,
    create_pretrain_val_loader,
    create_finetune_arrays,
)
