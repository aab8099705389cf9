"""Checkpointing: flax msgpack serialization of {params, batch_stats, meta}.

The reference saves best-only torch checkpoints
``{epoch, model_state_dict, val_metrics}`` (pretrain.py:263-271,
finetune.py:274-279). Same content here, torch-free: params + BN running stats
(the state_dict equivalent) serialized with flax msgpack. The transfer
contract (backbone subtree + ENZYMES encoder) is applied at load time by
``models.load_pretrained_into_finetune``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, params, batch_stats, epoch: int,
                    val_metrics: Optional[Dict[str, float]] = None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
        "meta": {
            "epoch": int(epoch),
            "val_metrics": {k: float(v) for k, v in (val_metrics or {}).items()},
            **(extra or {}),
        },
    }
    blob = serialization.msgpack_serialize(_to_plain(payload))
    path.write_bytes(blob)


def load_checkpoint(path) -> Dict[str, Any]:
    blob = Path(path).read_bytes()
    return serialization.msgpack_restore(blob)


def _to_plain(tree):
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_plain(v) for v in tree]
    if hasattr(tree, "__array__"):
        return np.asarray(tree)
    return tree
