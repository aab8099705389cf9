"""Adaptive loss balancer as a pure in-jit function.

Behavioural port of src/pretrain/adaptive_loss_balancer.py:14-53:

  * single task: passthrough, step count NOT incremented;
  * first 100 calls (``step_count``): equal weights 1/K;
  * after: w_i ∝ 1/(|L_i| + 1e-8), normalized to sum 1 (computed from
    detached losses);
  * total = clamp(Σ w_i·L_i, min 1e-6).

The reference's ``domain_adv`` branch (:21-24) is dead in practice — the
caller always excludes domain_adv from the main losses (pretrain.py:138) — and
is intentionally not reproduced. The stateful ``step_count`` (which the
reference increments on eval calls too, SURVEY.md §2.4) lives in the train
state and is threaded through.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gnn_pretraining_tpu import config


def balance_losses(task_losses: Dict[str, jnp.ndarray], step_count: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
    """Returns (total_loss, weights, new_step_count)."""
    names = list(task_losses.keys())
    if len(names) == 1:
        return task_losses[names[0]], {names[0]: jnp.float32(1.0)}, step_count

    step_count = step_count + 1
    vals = jnp.stack([jax.lax.stop_gradient(task_losses[n]) for n in names])

    inv = 1.0 / (jnp.abs(vals) + config.BALANCER_EPSILON)
    adaptive = inv / jnp.sum(inv)
    equal = jnp.full((len(names),), 1.0 / len(names))
    w = jnp.where(step_count > config.BALANCER_WARMUP_STEPS, adaptive, equal)

    total = jnp.sum(w * jnp.stack([task_losses[n] for n in names]))
    total = jnp.maximum(total, config.BALANCER_MIN_TOTAL_LOSS)
    weights = {n: w[i] for i, n in enumerate(names)}
    return total, weights, step_count
