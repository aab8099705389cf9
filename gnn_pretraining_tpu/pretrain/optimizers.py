"""Task-specific AdamW via optax.multi_transform.

Behavioural port of src/pretrain/optimizers.py:18-75: params whose (top-level)
path contains ``heads_{task}`` get that task's LR (LP 5e-7, NFM/NC/GC/GP 1e-5,
DA 5e-6); everything else (encoders, mask token, backbone) uses the default
group (lr 1e-5); weight decay 1e-5 everywhere. AdamW hyperparameters match
torch defaults (β=(0.9, 0.999), eps=1e-8, decoupled weight decay scaled by
lr).
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax

from gnn_pretraining_tpu import config


def _label_for_path(top_key: str, active_tasks: Sequence[str]) -> str:
    for task in active_tasks:
        if top_key == f"heads_{task}" or top_key.startswith(f"heads_{task}_"):
            return task
    return "default"


def param_labels(params, active_tasks: Sequence[str]):
    return {k: jax.tree.map(lambda _: _label_for_path(k, active_tasks), v)
            for k, v in params.items()}


def _adamw(lr: float) -> optax.GradientTransformation:
    return optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=config.DEFAULT_WEIGHT_DECAY)


def create_task_specific_optimizer(params, active_tasks: Sequence[str]
                                   ) -> optax.GradientTransformation:
    transforms = {"default": _adamw(config.DEFAULT_LR)}
    for task in active_tasks:
        transforms[task] = _adamw(config.TASK_SPECIFIC_LR[task])
    labels = param_labels(params, active_tasks)
    return optax.multi_transform(transforms, labels)


def clip_grads_torch(grads, max_norm: float = config.MAX_GRAD_NORM):
    """torch clip_grad_norm_ semantics: scale by max_norm/(norm+1e-6) if above.

    Returns (clipped_grads, pre_clip_global_norm).
    """
    import jax.numpy as jnp

    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    coef = max_norm / (total + 1e-6)
    coef = jnp.minimum(coef, 1.0)
    return jax.tree.map(lambda g: g * coef, grads), total
