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
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _atomic_write_bytes(path: Path, blob: bytes) -> None:
    """Write via temp file + os.replace so a kill mid-write (OOM, watchdog
    restart) can never leave a truncated checkpoint in place of a good one."""
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(blob)
    os.replace(tmp, path)


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
    _atomic_write_bytes(path, blob)


def load_checkpoint(path) -> Dict[str, Any]:
    blob = Path(path).read_bytes()
    return serialization.msgpack_restore(blob)


def save_train_state(path, state, epoch: int, best_total: float,
                     epochs_since_improvement: int, extra=None) -> None:
    """Full in-run resume state: params + BN stats + optimizer + counters.

    The reference cannot resume mid-run (no optimizer state in checkpoints,
    SURVEY.md §5); this is the cheap Orbax-style add, serialized with flax
    msgpack so it stays torch-free.
    """
    from flax import serialization as ser

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": ser.to_state_dict(jax.device_get(state.opt_state)),
        "counters": {
            "opt_step": int(state.opt_step),
            "balancer_step": int(state.balancer_step),
            "epoch": int(epoch),
            "best_total": float(best_total),
            "epochs_since_improvement": int(epochs_since_improvement),
        },
        "extra": extra or {},
    }
    _atomic_write_bytes(path, serialization.msgpack_serialize(_to_plain(payload)))


def load_train_state(path, state_template):
    """Restore a ``save_train_state`` file onto a freshly-built state."""
    import jax.numpy as jnp
    from flax import serialization as ser

    payload = serialization.msgpack_restore(Path(path).read_bytes())
    opt_state = ser.from_state_dict(state_template.opt_state,
                                    payload["opt_state"])
    c = payload["counters"]
    state = state_template.replace(
        params=payload["params"], batch_stats=payload["batch_stats"],
        opt_state=opt_state, opt_step=jnp.int32(c["opt_step"]),
        balancer_step=jnp.int32(c["balancer_step"]))
    return state, c


def save_transfer_artifact(path, params, batch_stats,
                           meta: Optional[Dict[str, Any]] = None) -> None:
    """Persist ONLY the transfer-contract subtree as a compact fp16 artifact.

    The reference ships full torch checkpoints; the transfer contract
    (reference finetune_model.py:128-146) only ever reads ``gnn_backbone.*``
    params+BN stats plus the ENZYMES encoder, so that subtree — cast to fp16,
    ~2.7 MB — is the durable artifact worth tracking in git (VERDICT r3 #2).
    Restored by ``load_transfer_artifact`` into the exact pytree shape
    ``models.load_pretrained_into_finetune`` consumes.
    """
    def _subtree(col):
        keep = {}
        for key in ("gnn_backbone", "input_encoders_ENZYMES"):
            if key in col:
                keep[key] = col[key]
        return keep

    def _cast16(tree):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16)
            if np.asarray(a).dtype == np.float32 else np.asarray(a), tree)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": _cast16(_to_plain(_subtree(jax.device_get(params)))),
        "batch_stats": _cast16(_to_plain(_subtree(jax.device_get(batch_stats)))),
        "meta": {k: (float(v) if isinstance(v, (int, float, np.floating))
                     and not isinstance(v, bool) else v)
                 for k, v in (meta or {}).items()},
    }
    _atomic_write_bytes(path, serialization.msgpack_serialize(payload))


def load_transfer_artifact(path) -> Dict[str, Any]:
    """Load a ``save_transfer_artifact`` file, promoting fp16 back to f32 so
    the restored weights drop into an f32 fine-tune pytree unchanged."""
    payload = serialization.msgpack_restore(Path(path).read_bytes())

    def _promote(tree):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32)
            if np.asarray(a).dtype == np.float16 else a, tree)

    return {"params": _promote(payload["params"]),
            "batch_stats": _promote(payload["batch_stats"]),
            "meta": payload.get("meta", {})}


def _to_plain(tree):
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_plain(v) for v in tree]
    if hasattr(tree, "__array__"):
        return np.asarray(tree)
    return tree
