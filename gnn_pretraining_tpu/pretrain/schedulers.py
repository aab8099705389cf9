"""Step schedulers as pure functions of the (traced) step counter.

Behavioural ports of src/pretrain/schedulers.py:10-45, usable inside jit:

  * temperature: geometric anneal τ = 0.5 · (0.2/0.5)^progress
  * GRL λ: 0 for the first 40% of steps, then (2/(1+e^{−10p}) − 1) · 0.01
"""

from __future__ import annotations

import jax.numpy as jnp

from gnn_pretraining_tpu import config


def temperature_at(step: jnp.ndarray, total_steps: int) -> jnp.ndarray:
    progress = jnp.minimum(1.0, step.astype(jnp.float32) / max(total_steps, 1))
    return config.INITIAL_TEMP * (config.FINAL_TEMP / config.INITIAL_TEMP) ** progress


def grl_lambda_at(step: jnp.ndarray, total_steps: int) -> jnp.ndarray:
    start = config.START_ADVERSARIAL_EPOCH_FRACTION * total_steps
    remaining = jnp.maximum(total_steps - start, 1.0)
    p = (step.astype(jnp.float32) - start) / remaining
    lam = (2.0 / (1.0 + jnp.exp(-config.GRL_GAMMA * p)) - 1.0) * config.MAX_LAMBDA
    return jnp.where(step < start, 0.0, lam)
