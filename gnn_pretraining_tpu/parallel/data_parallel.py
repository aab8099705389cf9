"""Data-parallel pretraining: the full multi-task train step under shard_map.

Graphs of every domain batch are sharded over the ``data`` mesh axis. Exact
single-device semantics are preserved (not approximated):

  * additive task losses (NFM, LP, GP, DA) psum their sums/sizes
    (pretrain/tasks.py ``_preduce``);
  * contrastive tasks all_gather projections so NT-Xent negatives span the
    global batch (ops/sddmm.py);
  * BatchNorm runs as SyncBN (models/norm.py ``axis_name``), reproducing
    global-batch statistics;
  * per-task grads are psum'd, then PCGrad / balancing / clipping / AdamW run
    replicated — parameters remain bit-identical across devices.

Dropout and sampling keys are folded with the device index, so each shard
draws independent randomness (the same distribution a single device would use
across its rows).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.batch import GraphBatch, build_batch, round_up
from gnn_pretraining_tpu.models.pretrain_model import PretrainableGNN
from gnn_pretraining_tpu.pretrain.balancer import balance_losses
from gnn_pretraining_tpu.pretrain.optimizers import clip_grads_torch
from gnn_pretraining_tpu.pretrain.pcgrad import apply_pcgrad
from gnn_pretraining_tpu.pretrain.schedulers import grl_lambda_at, temperature_at
from gnn_pretraining_tpu.pretrain.tasks import TaskContext, compute_task_loss


def shard_sampler_step(sampler, n_dev: int) -> Dict[str, GraphBatch]:
    """One balanced multi-domain step as per-device stacked sub-batches.

    The sampler's ``samples_per_domain`` graphs per domain are distributed
    round-robin across ``n_dev`` devices; every leaf gains a leading device
    axis for ``shard_map``'s ``P('data')`` input spec.
    """
    out = {}
    for d, store in sampler.domain_stores.items():
        ix = sampler.train_indices[d]
        spd = sampler.samples_per_domain
        chosen = ix[sampler.rng.integers(0, len(ix), spd)]
        g_local = max(1, -(-spd // n_dev))
        max_n = int(np.diff(store.node_offsets)[ix].max())
        max_e = int(np.diff(store.edge_offsets)[ix].max())
        n_pad = round_up(g_local * max_n)
        e_pad = round_up(max(g_local * max_e, 1))
        subs = []
        for dev in range(n_dev):
            sel = chosen[dev::n_dev]
            subs.append(build_batch(store, sel, n_pad, e_pad, g_local,
                                    with_properties=True))
        out[d] = jax.tree.map(lambda *xs: np.stack(xs), *subs)
    return out


def make_dp_train_step(model: PretrainableGNN, cfg: config.PretrainConfig,
                       optimizer, total_steps: int, mesh: Mesh):
    """DP variants of the per-task gradient step + the combine/update step.

    ``model`` must be constructed with ``axis_name='data'``.
    """
    main_tasks = [t for t in cfg.active_tasks if t != "domain_adv"]
    has_da = "domain_adv" in cfg.active_tasks

    def _local_task_fn(task):
        def fn(params, stats, domain_batches, key, step):
            domain_batches = jax.tree.map(lambda x: x[0], domain_batches)
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            ctx = TaskContext(temperature=temperature_at(step, total_steps),
                              grl_lambda=grl_lambda_at(step, total_steps),
                              train=True, axis_name="data")

            def loss_fn(p, s):
                loss, pd, s2 = compute_task_loss(task, model, p, s,
                                                 domain_batches, key, ctx)
                return loss, (pd, s2)

            (loss, (pd, stats2)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats)
            # SPMD autodiff with transpose(psum)=psum makes each device's
            # grad equal n_dev × its local contribution to the replicated
            # loss; pmean recovers exactly the single-device global gradient.
            g = jax.lax.pmean(g, "data")
            return loss, pd, stats2, g

        return fn

    task_steps = {}
    for task in cfg.active_tasks:
        fn = shard_map(_local_task_fn(task), mesh=mesh,
                       in_specs=(P(), P(), P("data"), P(), P()),
                       out_specs=(P(), P(), P(), P()), check_vma=False)
        task_steps[task] = jax.jit(fn)

    @jax.jit
    def update_step(params, opt_state, balancer_step, task_losses, grads,
                    da_grads, key):
        import optax

        total_loss, weights, balancer_step = balance_losses(
            task_losses, balancer_step)
        surgery_metrics = {}
        if len(main_tasks) > 1:
            combined, surgery_metrics = apply_pcgrad(grads, params, key)
        else:
            combined = grads[main_tasks[0]]
        if da_grads is not None:
            combined = jax.tree.map(lambda a, b: a + b, combined, da_grads)
        clipped, pre_norm = clip_grads_torch(combined)
        updates, opt_state = optimizer.update(clipped, opt_state, params)
        params = optax.apply_updates(params, updates)
        post_norm = pre_norm * jnp.minimum(
            config.MAX_GRAD_NORM / (pre_norm + 1e-6), 1.0)
        metrics = dict(surgery_metrics)
        metrics["train/loss/total"] = total_loss
        for t, w in weights.items():
            metrics[f"train/loss_balancer/weight/{t}"] = w
        metrics["train/gradients/model_grad_norm"] = post_norm
        return params, opt_state, balancer_step, metrics

    def train_step(state, stacked_batches, key):
        keys = jax.random.split(key, len(cfg.active_tasks) + 1)
        stats = state.batch_stats
        task_losses, per_domain, grads = {}, {}, {}
        for i, t in enumerate(main_tasks):
            loss, pd, stats, g = task_steps[t](
                state.params, stats, stacked_batches, keys[i],
                state.opt_step.astype(jnp.float32))
            task_losses[t] = loss
            per_domain[t] = pd
            grads[t] = g
        da_grads = None
        if has_da:
            da_loss, da_pd, stats, da_grads = task_steps["domain_adv"](
                state.params, stats, stacked_batches,
                keys[len(main_tasks)], state.opt_step.astype(jnp.float32))
            per_domain["domain_adv"] = da_pd
            task_losses = dict(task_losses)
        params, opt_state, balancer_step, metrics = update_step(
            state.params, state.opt_state, state.balancer_step,
            {t: task_losses[t] for t in main_tasks}, grads, da_grads, keys[-1])
        for t, pd in per_domain.items():
            for d, v in pd.items():
                metrics[f"train/loss/{d}/{t}"] = v
        new_state = state.replace(params=params, batch_stats=stats,
                                  opt_state=opt_state,
                                  opt_step=state.opt_step + 1,
                                  balancer_step=balancer_step)
        return new_state, metrics

    return train_step
