"""Pretraining runtime: one jit-compiled multi-task train step + host loop.

Behavioural port of src/pretrain/pretrain.py:96-353, re-architected for XLA:
all task losses, per-task gradients, PCGrad projections, the loss balancer,
domain-adversarial accumulation, torch-style clipping and the AdamW update run
inside a single compiled step per scheme. The host loop only samples batches,
logs metrics, evaluates per epoch, early-stops (patience 25) and checkpoints
the best balanced validation loss.
"""

from __future__ import annotations

import argparse
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.loaders import (
    create_pretrain_train_loader,
    create_pretrain_val_loader,
)
from gnn_pretraining_tpu.models.pretrain_model import PretrainableGNN
from gnn_pretraining_tpu.pretrain.balancer import balance_losses
from gnn_pretraining_tpu.pretrain.optimizers import (
    clip_grads_torch,
    create_task_specific_optimizer,
)
from gnn_pretraining_tpu.pretrain.pcgrad import apply_pcgrad
from gnn_pretraining_tpu.pretrain.schedulers import grl_lambda_at, temperature_at
from gnn_pretraining_tpu.pretrain.tasks import TaskContext, compute_task_loss
from gnn_pretraining_tpu.utils.checkpoint import save_checkpoint
from gnn_pretraining_tpu.utils.logging import MetricLogger


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: object
    opt_step: jnp.ndarray       # scheduler step counter (pre-step value)
    balancer_step: jnp.ndarray  # AdaptiveLossBalancer.step_count


def init_model(cfg: config.PretrainConfig, sample_batches, aggregation: str,
               axis_name=None) -> Tuple[PretrainableGNN, dict]:
    """Initialize all encoders/backbone/heads.

    The init traces run on the host CPU backend when the default device is a
    remote TPU: each of the ~10 init programs costs seconds of relay compile
    round-trips but microseconds of math, and jax.random is backend-invariant
    so the resulting parameters are identical. The finished variable tree is
    shipped to the default device in one transfer.
    """
    import contextlib

    ship = jax.default_backend() != "cpu"
    ctx = (jax.default_device(jax.devices("cpu")[0]) if ship
           else contextlib.nullcontext())
    with ctx:
        model, variables = _init_model_impl(cfg, sample_batches, aggregation,
                                            axis_name)
    if ship:
        variables = jax.device_put(variables, jax.devices()[0])
    return model, variables


def _init_model_impl(cfg: config.PretrainConfig, sample_batches,
                     aggregation: str, axis_name=None
                     ) -> Tuple[PretrainableGNN, dict]:
    model = PretrainableGNN(domain_names=tuple(cfg.pretrain_domains),
                            task_names=tuple(cfg.active_tasks),
                            aggregation=aggregation, axis_name=axis_name)
    first_domain = cfg.pretrain_domains[0]
    b = sample_batches[first_domain]
    variables = model.init(
        {"params": jax.random.PRNGKey(cfg.seed),
         "dropout": jax.random.PRNGKey(cfg.seed + 1)},
        jnp.asarray(b.x), jnp.asarray(b.node_mask), first_domain, False,
        senders=jnp.asarray(b.senders), receivers=jnp.asarray(b.receivers),
        edge_mask=jnp.asarray(b.edge_mask))
    # init() only traces one domain's encoder+backbone path; initialize the
    # remaining encoders and the heads by running init per domain.
    for domain in cfg.pretrain_domains[1:]:
        bd = sample_batches[domain]
        v2 = model.init(
            {"params": jax.random.PRNGKey(cfg.seed),
             "dropout": jax.random.PRNGKey(cfg.seed + 1)},
            jnp.asarray(bd.x), jnp.asarray(bd.node_mask), domain, False,
            senders=jnp.asarray(bd.senders), receivers=jnp.asarray(bd.receivers),
            edge_mask=jnp.asarray(bd.edge_mask))
        for col in variables:
            for k, v in v2[col].items():
                if k not in variables[col]:
                    variables[col][k] = v
    # Heads: initialize lazily via a dedicated init pass.
    variables = _init_heads(model, cfg, variables, sample_batches)
    return model, variables


def _init_heads(model, cfg, variables, sample_batches):
    """Ensure every head's params exist by tracing each head method once."""
    rngs = {"params": jax.random.PRNGKey(cfg.seed + 2),
            "dropout": jax.random.PRNGKey(cfg.seed + 3)}
    h = jnp.zeros((8, config.GNN_HIDDEN_DIM))
    s2 = jnp.zeros((4, 2 * config.GNN_HIDDEN_DIM))
    idx = jnp.zeros(4, jnp.int32)
    for task in cfg.active_tasks:
        for domain in cfg.pretrain_domains:
            if task == "node_feat_mask":
                method, args = PretrainableGNN.nfm_head, (h, domain, False)
            elif task == "link_pred":
                method, args = PretrainableGNN.link_pred_head, (h, idx, idx, False)
            elif task == "node_contrast":
                method, args = PretrainableGNN.node_contrast_head, (h, domain, False)
            elif task == "graph_contrast":
                method, args = PretrainableGNN.graph_contrast_head, (s2, domain, False)
            elif task == "graph_prop":
                method, args = PretrainableGNN.graph_prop_head, (h, domain, False)
            elif task == "domain_adv":
                method, args = PretrainableGNN.domain_adv_head, (h, jnp.float32(0.0), False)
            out = model.init(rngs, *args, method=method)
            for k, v in out.get("params", {}).items():
                if k not in variables["params"]:
                    variables["params"][k] = v
            if task in ("link_pred", "domain_adv"):
                break  # shared heads: one init is enough
    return variables


def _make_step_parts(model: PretrainableGNN, cfg: config.PretrainConfig,
                     optimizer, total_steps: int):
    """The multi-task step decomposed into shareable pure pieces.

    Both step builders below compose the SAME task-grad body, combine/update
    core, and metric assembly — only the jit boundaries differ (per-task jit
    + host orchestration for the unfused path; one traced body inside
    ``lax.scan`` for the chunked path). Keeping one copy means a semantics
    fix cannot drift between the paths.
    """
    main_tasks = [t for t in cfg.active_tasks if t != "domain_adv"]
    has_da = "domain_adv" in cfg.active_tasks

    def task_grad(params, stats, task, domain_batches, key, step):
        ctx = TaskContext(temperature=temperature_at(step, total_steps),
                          grl_lambda=grl_lambda_at(step, total_steps),
                          train=True)

        def loss_fn(p, s):
            loss, pd, s2 = compute_task_loss(task, model, p, s, domain_batches,
                                             key, ctx)
            return loss, (pd, s2)

        (loss, (pd, stats2)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats)
        return loss, pd, stats2, g

    def update_core(params, opt_state, balancer_step, task_losses, grads,
                    da_grads, key):
        total_loss, weights, balancer_step = balance_losses(
            task_losses, balancer_step)

        surgery_metrics = {}
        if len(main_tasks) > 1:
            combined, surgery_metrics = apply_pcgrad(grads, key)
        else:
            combined = grads[main_tasks[0]]
        if da_grads is not None:
            combined = jax.tree.map(lambda a, b: a + b, combined, da_grads)

        clipped, pre_norm = clip_grads_torch(combined)
        updates, opt_state = optimizer.update(clipped, opt_state, params)
        params = optax.apply_updates(params, updates)

        # Reference logs the grad norm *after* clipping (pretrain.py:182-188).
        post_norm = pre_norm * jnp.minimum(
            config.MAX_GRAD_NORM / (pre_norm + 1e-6), 1.0)

        metrics = dict(surgery_metrics)
        metrics["train/loss/total"] = total_loss
        for t, w in weights.items():
            metrics[f"train/loss_balancer/weight/{t}"] = w
        metrics["train/gradients/model_grad_norm"] = post_norm
        return params, opt_state, balancer_step, metrics

    def assemble_metrics(metrics, per_domain_task, task_losses, da_loss, step):
        for t, pd in per_domain_task.items():
            for d, v in pd.items():
                metrics[f"train/loss/{d}/{t}"] = v
        all_losses = dict(task_losses)
        if has_da:
            all_losses["domain_adv"] = da_loss
        for t, v in all_losses.items():
            metrics[f"train/loss/{t}"] = v
        for d in cfg.pretrain_domains:
            # device-side sum; fetched later in the bundled metric flush
            metrics[f"train/loss/{d}"] = sum(
                per_domain_task[t][d] for t in per_domain_task)
        if has_da:
            # Reference logs λ after stepping the scheduler (pretrain.py:173).
            metrics["train/domain_adv/lambda"] = grl_lambda_at(
                step + 1, total_steps)
            metrics["train/domain_adv/loss"] = da_loss
        return metrics

    def run_tasks(state, domain_batches, keys, grad_fn):
        """All task grads for one step; returns the accumulated pieces."""
        step = state.opt_step
        stats = state.batch_stats
        task_losses, per_domain_task, grads = {}, {}, {}
        for i, t in enumerate(main_tasks):
            loss, pd, stats, g = grad_fn(state.params, stats, t,
                                         domain_batches, keys[i], step)
            task_losses[t] = loss
            per_domain_task[t] = pd
            grads[t] = g

        da_loss = None
        da_grads = None
        if has_da:
            da_loss, da_pd, stats, da_grads = grad_fn(
                state.params, stats, "domain_adv", domain_batches,
                keys[len(main_tasks)], step)
            per_domain_task["domain_adv"] = da_pd
        return stats, task_losses, per_domain_task, grads, da_loss, da_grads

    return task_grad, update_core, assemble_metrics, run_tasks


def make_train_step(model: PretrainableGNN, cfg: config.PretrainConfig,
                    optimizer, total_steps: int):
    """Per-task jitted gradient steps + one jitted combine/update step.

    Splitting keeps each compiled program small (one monolithic step for a
    5-task scheme takes minutes to compile); intermediate grads stay on device
    between the sub-steps, so the host only orchestrates.
    """
    task_grad, update_core, assemble_metrics, run_tasks = _make_step_parts(
        model, cfg, optimizer, total_steps)
    task_grad_step = jax.jit(task_grad, static_argnames=("task",))
    update_step = jax.jit(update_core, donate_argnums=(1, 2))

    def train_step(state: TrainState, domain_batches, key):
        step = state.opt_step
        keys = jax.random.split(key, len(cfg.active_tasks) + 1)
        stats, task_losses, per_domain_task, grads, da_loss, da_grads = (
            run_tasks(state, domain_batches, keys, task_grad_step))

        params, opt_state, balancer_step, metrics = update_step(
            state.params, state.opt_state, state.balancer_step, task_losses,
            grads, da_grads, keys[-1])

        metrics = assemble_metrics(metrics, per_domain_task, task_losses,
                                   da_loss, step)
        new_state = TrainState(params=params, batch_stats=stats,
                               opt_state=opt_state, opt_step=step + 1,
                               balancer_step=balancer_step)
        return new_state, metrics

    return train_step


def make_chunked_train_step(model: PretrainableGNN, cfg: config.PretrainConfig,
                            optimizer, total_steps: int):
    """One jitted program running a CHUNK of train steps via ``lax.scan``.

    The per-call relay dispatch + metric round-trips dominate wall-clock on
    tiny graph batches (~150 ms/step against ~10 ms of compute through the
    TPU tunnel), so the host uploads a stacked chunk of sampled batches and
    the whole multi-task step — task grads, PCGrad, balancer, AdamW — runs
    ``chunk`` times inside one XLA program. The PRNG key is carried through
    the scan with the same per-step ``split`` chain as the host loop, so the
    sampled noise stream is identical to the unfused path.
    """
    task_grad, update_core, assemble_metrics, run_tasks = _make_step_parts(
        model, cfg, optimizer, total_steps)

    def step_fn(state: TrainState, domain_batches, key):
        step = state.opt_step
        keys = jax.random.split(key, len(cfg.active_tasks) + 1)
        stats, task_losses, per_domain_task, grads, da_loss, da_grads = (
            run_tasks(state, domain_batches, keys, task_grad))

        params, opt_state, balancer_step, metrics = update_core(
            state.params, state.opt_state, state.balancer_step, task_losses,
            grads, da_grads, keys[-1])

        metrics = assemble_metrics(metrics, per_domain_task, task_losses,
                                   da_loss, step)
        new_state = TrainState(params=params, batch_stats=stats,
                               opt_state=opt_state, opt_step=step + 1,
                               balancer_step=balancer_step)
        return new_state, metrics

    # Populated at trace time (aot_compile_chunks lowers before the loop
    # runs); the row order of the packed metric array, host-readable.
    metric_names: List[str] = []

    # Donate only the state: the key is 8 bytes and device_put may alias the
    # host loop's key array, which eval still splits afterwards.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk_fn(state: TrainState, stacked_batches, key):
        def body(carry, xs):
            st, k = carry
            k, sub = jax.random.split(k)  # same chain as the host loop
            st, metrics = step_fn(st, xs, sub)
            return (st, k), metrics

        (state, key), metrics = jax.lax.scan(body, (state, key),
                                             stacked_batches)
        # Pack every metric into ONE [M, chunk] array: a device_get of a
        # dict of ~30 tiny arrays costs one relay RPC PER LEAF (~0.35s each,
        # 22s per flush measured); one packed array is one RPC.
        names = sorted(metrics)
        if not metric_names:
            metric_names.extend(names)
        packed = jnp.stack([metrics[n].astype(jnp.float32) for n in names])
        return state, key, packed  # [num_metrics, chunk]

    return chunk_fn, metric_names


def stack_batches(batch_dicts):
    """Stack a list of per-domain batch dicts into one chunk pytree."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batch_dicts)


def aot_compile_chunks(chunk_fn, state, sample, chunk_sizes, key):
    """AOT-compile the scan-chunk programs, one per chunk length.

    On the relay, a compile dispatched asynchronously while batch uploads are
    in flight stalls the command stream for minutes; lowering with
    ShapeDtypeStructs and compiling synchronously (nothing else in flight)
    takes ~15-20s fresh and ~2s from the persistent cache.
    """
    def sds(a):
        return jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype
                                    if not hasattr(a, "dtype") else a.dtype)

    state_sds = jax.tree.map(sds, state)
    key_sds = sds(key)
    compiled = {}
    for c in sorted(set(chunk_sizes)):
        stacked_sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct((c,) + np.shape(a),
                                           np.asarray(a).dtype), sample)
        compiled[c] = chunk_fn.lower(state_sds, stacked_sds,
                                     key_sds).compile()
    return compiled


def make_eval_fn(model: PretrainableGNN, cfg: config.PretrainConfig,
                 total_steps: int):
    @functools.partial(jax.jit, static_argnames=("task", "domain"))
    def eval_task_batch(params, stats, task, domain, batch, key, step):
        ctx = TaskContext(temperature=temperature_at(step, total_steps),
                          grl_lambda=grl_lambda_at(step, total_steps),
                          train=False)
        loss, _, _ = compute_task_loss(task, model, params, stats,
                                       {domain: batch}, key, ctx)
        return loss

    return eval_task_batch


def _np_balance(task_losses: Dict[str, float], step_count: int
                ) -> Tuple[float, int]:
    """Host-side mirror of the balancer for eval totals (same semantics)."""
    names = list(task_losses.keys())
    if len(names) == 1:
        return float(task_losses[names[0]]), step_count
    step_count += 1
    vals = np.array([task_losses[n] for n in names])
    if step_count > config.BALANCER_WARMUP_STEPS:
        inv = 1.0 / (np.abs(vals) + config.BALANCER_EPSILON)
        w = inv / inv.sum()
    else:
        w = np.full(len(names), 1.0 / len(names))
    return float(max((w * vals).sum(), config.BALANCER_MIN_TOTAL_LOSS)), step_count


def run_evaluation(eval_fn, state, cfg, val_loaders, key, epoch,
                   logger, global_step):
    # Dispatch every (task, domain, batch) loss asynchronously, then fetch
    # them in one bundled transfer — one device round-trip per eval epoch.
    futures = {}
    for task in cfg.active_tasks:
        for domain, batches in val_loaders.items():
            futs = []
            for b in batches:
                key, sub = jax.random.split(key)
                futs.append(eval_fn(state.params, state.batch_stats, task,
                                    domain, b, sub, state.opt_step))
            futures[(task, domain)] = futs
    fetched = jax.device_get(futures)

    per_task = {}
    per_domain_task = {d: {} for d in val_loaders}
    for task in cfg.active_tasks:
        domain_means = []
        for domain in val_loaders:
            m = float(np.mean([float(v) for v in fetched[(task, domain)]]))
            per_domain_task[domain][task] = m
            domain_means.append(m)
        per_task[task] = float(np.mean(domain_means))

    main = {t: v for t, v in per_task.items() if t != "domain_adv"}
    balancer_step = int(state.balancer_step)
    total, balancer_step = _np_balance(main, balancer_step)

    metrics = {}
    for d, tasks in per_domain_task.items():
        for t, v in tasks.items():
            metrics[f"val/loss/{d}/{t}"] = v
        metrics[f"val/loss/{d}"] = float(np.mean(list(tasks.values())))
    for t, v in per_task.items():
        metrics[f"val/loss/{t}"] = v
    metrics["val/loss/total"] = total
    if "domain_adv" in per_task:
        metrics["val/domain_adv/loss"] = per_task["domain_adv"]
    logger.log(metrics, step=global_step)
    return total, metrics, balancer_step


def pretrain(cfg: config.PretrainConfig, aggregation: str = "dense",
             epochs: int = config.PRETRAIN_EPOCHS,
             processed_dir=None, use_wandb: bool = True,
             resume: bool = False, data_parallel: bool = False,
             out_root=None, chunk_steps: int = 32) -> dict:
    from pathlib import Path

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    # All artifacts live under out_root (checkpoints + metrics), so tests and
    # smoke runs can point at a tmp dir and never pollute the production
    # output store (VERDICT r1 weak #1).
    import time as _time

    t_start = _time.time()

    def _phase(msg: str) -> None:
        print(f"[{cfg.run_name} +{_time.time() - t_start:7.1f}s] {msg}",
              flush=True)

    out_root = Path(out_root or config.OUTPUT_DIR)
    pretrain_out_dir = out_root / "pretrain"
    pretrain_out_dir.mkdir(parents=True, exist_ok=True)

    logger = MetricLogger(config.PRETRAIN_PROJECT_NAME, cfg.run_name,
                          out_dir=out_root / "metrics", use_wandb=use_wandb)

    val_loaders = {d: create_pretrain_val_loader(d, processed_dir=processed_dir)
                   for d in cfg.pretrain_domains}
    train_loader = create_pretrain_train_loader(cfg.pretrain_domains, rng,
                                                processed_dir=processed_dir)
    steps_per_epoch = len(train_loader)
    total_steps = steps_per_epoch * epochs

    n_dev = len(jax.devices())
    use_dp = data_parallel and n_dev > 1

    _phase("data loaded")
    sample = train_loader.sample_step()
    model, variables = init_model(cfg, sample, aggregation,
                                  axis_name="data" if use_dp else None)
    _phase("model initialized")

    optimizer = create_task_specific_optimizer(variables["params"],
                                               cfg.active_tasks)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]),
                       opt_step=jnp.int32(0),
                       balancer_step=jnp.int32(0))

    if use_dp:
        from gnn_pretraining_tpu.parallel.data_parallel import (
            dp_pads,
            make_dp_train_step,
            shard_sampler_step,
        )
        from gnn_pretraining_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=n_dev)
        train_step = make_dp_train_step(model, cfg, optimizer, total_steps,
                                        mesh)
        pads = dp_pads(train_loader, n_dev)

        def train_batches():
            for _ in range(steps_per_epoch):
                yield shard_sampler_step(train_loader, n_dev, pads)
    elif chunk_steps > 1:
        # Default single-chip path: scan-fused chunks (see
        # make_chunked_train_step). Two programs compile per scheme (full
        # chunk + ragged tail), cached persistently across cells; both are
        # AOT-compiled below before any batch upload is in flight.
        chunk = int(min(chunk_steps, steps_per_epoch))
        chunk_fn, chunk_metric_names = make_chunked_train_step(
            model, cfg, optimizer, total_steps)
        train_step = None
    else:
        train_step = make_train_step(model, cfg, optimizer, total_steps)

        def train_batches():
            yield from train_loader
    eval_fn = make_eval_fn(model, cfg, total_steps)

    best_total = float("inf")
    epochs_since_improvement = 0
    global_step = 0
    start_epoch = 1
    ckpt_path = pretrain_out_dir / f"model_{cfg.run_name}.msgpack"
    resume_path = pretrain_out_dir / f"resume_{cfg.run_name}.msgpack"

    def _advance_key(k, n):
        """Advance the split chain by ``n`` steps without touching the relay:
        threefry is backend-deterministic, so the splits run on the host CPU
        backend and yield the exact values the default path would."""
        if n <= 0:
            return k
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            k = jax.device_put(jax.device_get(k), cpu)
        except RuntimeError:
            pass  # no CPU backend: split on the default device
        for _ in range(n):
            k, _ = jax.random.split(k)
        return jax.device_get(k)

    if resume and resume_path.exists():
        from gnn_pretraining_tpu.utils.checkpoint import load_train_state

        state, counters = load_train_state(resume_path, state)
        start_epoch = counters["epoch"] + 1
        best_total = counters["best_total"]
        epochs_since_improvement = counters["epochs_since_improvement"]
        global_step = counters["opt_step"]
        # Fast-forward the PRNG chain past the consumed epochs — each took
        # steps_per_epoch train splits (device-side in the chunked path,
        # host-side otherwise) + 1 eval split. Without this a resumed run
        # replays the pre-crash noise stream from the start.
        key = _advance_key(key, (start_epoch - 1) * (steps_per_epoch + 1))
        print(f"resumed {cfg.run_name} at epoch {start_epoch} "
              f"(best_val={best_total:.4f})")

    from gnn_pretraining_tpu.utils.profiling import ThroughputMeter

    # SpMM forwards per step per domain: one per plain-forward task, two for
    # the contrastive two-view tasks, each through the 5-layer backbone.
    forwards = sum(2 if t in ("node_contrast", "graph_contrast") else 1
                   for t in cfg.active_tasks)
    meter = ThroughputMeter()

    # Metric fetches are pipelined behind the dispatch and flushed in groups:
    # the host blocks on the device (one tunnel round-trip) once per
    # FLUSH_EVERY work items instead of every step; values are unchanged,
    # only written a few steps late. A work item is one step (unfused paths)
    # or one scan chunk of steps; per-step rows are identical either way.
    FLUSH_EVERY = 2 if train_step is None else 8
    pending = []  # [(first_step, epoch, device metrics, per-step edges [C])]

    def flush_pending():
        nonlocal pending
        if not pending:
            return
        fetched = jax.device_get([p[2] for p in pending])
        for (p_step0, p_epoch, _, p_edges), vals in zip(pending, fetched):
            if not isinstance(vals, dict):
                # Chunked path: one packed [M, chunk] array, rows in
                # chunk_metric_names order (one relay RPC per chunk).
                vals = dict(zip(chunk_metric_names, vals))
            arrs = {k: np.atleast_1d(np.asarray(v)) for k, v in vals.items()}
            for j, edges in enumerate(np.atleast_1d(p_edges)):
                m = {k: float(a[j]) for k, a in arrs.items()}
                m["train/progress/epoch"] = p_epoch
                meter.update(int(edges), forwards * config.GNN_NUM_LAYERS)
                m.update(meter.metrics())
                logger.log(m, step=p_step0 + j)
        pending = []

    def prefetched(gen, depth: int = 3, put=jax.device_put):
        """Host-side pipeline: batch assembly (sampling + native batcher) runs
        in a producer thread so the step loop never waits on it.

        The host->device upload happens on the CONSUMER thread: device_put
        from a second thread deadlocks against in-flight compiles/executions
        on the axon relay (observed: a threaded upload stretched a 130s run
        past 10 minutes), and the assembly work is the part worth
        overlapping anyway.
        """
        import os
        import queue
        import threading

        if os.environ.get("GNN_NO_PREFETCH"):
            for item in gen:
                yield put(item)
            return

        q = queue.Queue(maxsize=depth)
        stop = object()
        failure = []

        def producer():
            # The sentinel goes up in a finally: a generator exception must
            # surface in the consumer, not strand it on q.get() forever.
            try:
                for item in gen:
                    q.put(item)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                failure.append(exc)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if failure:
                    raise failure[0]
                return
            yield put(item)

    if train_step is None:
        # Chunked path: the producer thread samples+stacks chunk batches;
        # the loop uploads and dispatches one scan program per chunk.
        key_dev = jax.device_put(key)
        sizes = [chunk]
        if steps_per_epoch % chunk:
            sizes.append(steps_per_epoch % chunk)
        compiled_chunks = aot_compile_chunks(chunk_fn, state, sample, sizes,
                                             key_dev)
        _phase(f"chunk programs compiled (sizes {sorted(set(sizes))})")

        # Warm every eval program synchronously too — same relay rule.
        warm_key = jax.random.PRNGKey(0)
        for task in cfg.active_tasks:
            for domain, batches in val_loaders.items():
                jax.block_until_ready(eval_fn(
                    state.params, state.batch_stats, task, domain,
                    batches[0], warm_key, state.opt_step))
        _phase("eval programs compiled")

        def chunk_gen():
            buf, edges = [], []
            for _ in range(steps_per_epoch):
                s = train_loader.sample_step()
                buf.append(s)
                edges.append(int(sum(np.sum(b.edge_mask)
                                     for b in s.values())))
                if len(buf) == chunk:
                    yield stack_batches(buf), np.asarray(edges)
                    buf, edges = [], []
            if buf:
                yield stack_batches(buf), np.asarray(edges)

    def _put_chunk(item):
        # Upload only the batch pytree; the per-step edge counts stay host-side
        # (fetching them back would sync the stream every chunk).
        stacked, edges = item
        return jax.device_put(stacked), edges

    # A resume checkpoint taken at the final epoch makes this loop empty;
    # `epoch` must still be defined for the summary/return below.
    epoch = start_epoch - 1
    for epoch in range(start_epoch, epochs + 1):
        if train_step is None:
            # Re-seed the device chain from the host chain each epoch: the
            # host chain (mirrored below + one eval split per epoch) is the
            # unfused path's single key chain, so train and eval subkeys
            # interleave exactly as in the per-step path — no collisions,
            # and resume continues the stream bit-exactly.
            key_dev = jax.device_put(key)
            for stacked, step_edges in prefetched(chunk_gen(),
                                                  put=_put_chunk):
                # NOTE: no copy_to_host_async here — per-array async D2H
                # streams serialize the relay's command queue and stall the
                # next chunk for minutes; the bundled device_get in
                # flush_pending is the only fetch.
                state, key_dev, metrics = compiled_chunks[len(step_edges)](
                    state, stacked, key_dev)
                pending.append((global_step + 1, epoch, metrics,
                                np.asarray(step_edges)))
                global_step += len(step_edges)
                if len(pending) >= FLUSH_EVERY:
                    flush_pending()
                if epoch == start_epoch and global_step <= len(step_edges):
                    meter.reset()  # exclude compile from the throughput meter
            # Mirror the device-consumed per-step splits on the host chain,
            # so the eval split below continues the SAME stream as the
            # unfused path (eval keys previously collided with the device's
            # train-step keys, both starting from the base key).
            key = _advance_key(key, steps_per_epoch)
        else:
            for domain_batches in prefetched(train_batches()):
                global_step += 1
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, domain_batches, sub)
                # (No copy_to_host_async: see the chunked branch above.)
                step_edges = int(sum(np.sum(np.asarray(b.edge_mask))
                                     for b in domain_batches.values()))
                pending.append((global_step, epoch, metrics, step_edges))
                if len(pending) >= FLUSH_EVERY:
                    flush_pending()
                if global_step == 1:
                    meter.reset()  # exclude compile from the throughput meter
        flush_pending()
        _phase(f"epoch {epoch} trained")

        key, sub = jax.random.split(key)
        total, val_metrics, balancer_step = run_evaluation(
            eval_fn, state, cfg, val_loaders, sub, epoch, logger, global_step)
        _phase(f"epoch {epoch} evaluated (val_total={total:.4f})")
        state = state.replace(balancer_step=jnp.int32(balancer_step))

        if total < best_total:
            best_total = total
            epochs_since_improvement = 0
            save_checkpoint(ckpt_path, state.params, state.batch_stats, epoch,
                            val_metrics)
        else:
            epochs_since_improvement += 1

        # In-run resume checkpoint: fetching the full opt state through the
        # relay costs ~1s, so save every 5 epochs (resume replays ≤4 epochs).
        if resume and (epoch % 5 == 0 or epoch == epochs):
            from gnn_pretraining_tpu.utils.checkpoint import save_train_state

            save_train_state(resume_path, state, epoch, best_total,
                             epochs_since_improvement)

        if epochs_since_improvement >= int(epochs * config.PRETRAIN_PATIENCE_FRACTION):
            break

    from gnn_pretraining_tpu.utils.fidelity import fidelity_block

    logger.finish(extra=fidelity_block(epochs, cfg.seed, aggregation,
                                       processed_dir, cfg.pretrain_domains))
    return {"best_val_total": best_total, "epochs": epoch,
            "checkpoint": str(ckpt_path)}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_name", type=str, required=True)
    parser.add_argument("--seed", type=int, required=True)
    parser.add_argument("--epochs", type=int, default=config.PRETRAIN_EPOCHS)
    parser.add_argument("--aggregation", type=str, default="pallas",
                        choices=["dense", "pallas", "coo"])
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the in-run resume checkpoint")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard graphs over all devices (exact semantics)")
    parser.add_argument("--debug_nans", action="store_true")
    args = parser.parse_args()
    if args.debug_nans:
        from gnn_pretraining_tpu.utils.profiling import enable_nan_checks
        enable_nan_checks()
    cfg = config.PretrainConfig(exp_name=args.exp_name, seed=args.seed)
    result = pretrain(cfg, aggregation=args.aggregation, epochs=args.epochs,
                      use_wandb=not args.no_wandb, resume=args.resume,
                      data_parallel=args.data_parallel)
    print(result)


if __name__ == "__main__":
    main()
