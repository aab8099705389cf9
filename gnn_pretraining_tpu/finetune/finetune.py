"""Fine-tuning runtime: jitted per-task-type steps + host loop.

Behavioural port of src/finetune/finetune.py:109-436:

  * graph classification: padded graph batches, CE (or BCE-with-logits on
    logits[:,1] for binary domains, :150-155), mean-pool readout;
  * node classification: full-graph forward, logits gathered at the split's
    node indices (:162-179);
  * link prediction: per-batch hard-negative mining against a no-grad
    embedding over the train edges (:181-205), then BCE on sigmoid scores;
    val/test score the precomputed pos‖neg split edges;
  * AdamW param groups with freeze rules (finetune_model.py:38-64): encoder
    frozen for ENZYMES else lr 1e-3, backbone frozen for linear_probe else lr
    1e-4, head lr 1e-3; torch-default weight decay 0.01; no grad clipping;
  * model selection on val AUC (LP) / accuracy, patience = epochs/2, initial
    checkpoint, best-reload for the test pass (:269-283,369-374,415-416).
"""

from __future__ import annotations

import argparse
import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.loaders import (
    GraphClassificationData,
    LinkPredictionData,
    NodeClassificationData,
    create_finetune_arrays,
)
from gnn_pretraining_tpu.finetune import metrics as M
from gnn_pretraining_tpu.finetune.mining import (
    build_forbidden_mask,
    candidate_count,
    hard_count,
    mine_hard_negatives,
)
from gnn_pretraining_tpu.models.finetune_model import (
    FinetuneGNN,
    load_pretrained_into_finetune,
)
from gnn_pretraining_tpu.ops.spmm import build_dense_adjacency
from gnn_pretraining_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from gnn_pretraining_tpu.utils.losses import (
    bce_with_logits,
    masked_bce_with_logits_mean,
)
from gnn_pretraining_tpu.utils.logging import MetricLogger


@struct.dataclass
class FTState:
    params: dict
    batch_stats: dict
    opt_state: object


# ---------------------------------------------------------------------------
# Optimizer with freeze rules
# ---------------------------------------------------------------------------


def group_of_param(top_key: str, cfg: config.FinetuneConfig) -> str:
    if top_key == "input_encoder":
        return "frozen" if cfg.domain_name == "ENZYMES" else "encoder"
    if top_key == "gnn_backbone":
        return "frozen" if cfg.finetune_strategy == "linear_probe" else "backbone"
    return "head"


def create_finetune_optimizer(params, cfg: config.FinetuneConfig):
    def _adamw(lr):
        # torch AdamW default weight_decay=0.01 (the reference passes only lr).
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

    transforms = {
        "encoder": _adamw(config.LR_FINETUNE),
        "backbone": _adamw(config.LR_BACKBONE),
        "head": _adamw(config.LR_FINETUNE),
        "frozen": optax.set_to_zero(),
    }
    labels = {k: jax.tree.map(lambda _: group_of_param(k, cfg), v)
              for k, v in params.items()}
    lrs = {name: {"encoder": config.LR_FINETUNE, "backbone": config.LR_BACKBONE,
                  "head": config.LR_FINETUNE}[name]
           for name in ("encoder", "backbone", "head")
           if any(jax.tree.leaves(jax.tree.map(lambda l: l == name, labels)))}
    return optax.multi_transform(transforms, labels), labels, lrs


def _trainable_mask_tree(params, labels):
    return jax.tree.map(lambda _, l: float(l != "frozen"), params, labels)


def _masked_grad_norm(grads, labels):
    leaves = jax.tree.leaves(
        jax.tree.map(lambda g, l: jnp.where(l != "frozen",
                                            jnp.sum(g.astype(jnp.float32) ** 2),
                                            0.0),
                     grads, labels))
    return jnp.sqrt(sum(leaves))


def param_counts(params, labels) -> Tuple[int, int]:
    total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    trainable = sum(
        int(np.prod(np.shape(p))) for p, l in
        zip(jax.tree.leaves(params), jax.tree.leaves(labels)) if l != "frozen")
    return total, trainable


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------


def make_gc_steps(model, cfg, optimizer, labels):
    c = config.NUM_CLASSES[cfg.domain_name]
    binary = c == 2

    adj_dtype = jnp.bfloat16 if model.aggregation == "pallas" else jnp.float32

    def forward(params, stats, batch, train, rng):
        variables = {"params": params, "batch_stats": stats}
        adj = build_dense_adjacency(batch.senders, batch.receivers,
                                    batch.edge_mask, batch.num_nodes,
                                    dtype=adj_dtype)
        kwargs = dict(adj=adj, senders=batch.senders, receivers=batch.receivers,
                      edge_mask=batch.edge_mask, node_graph=batch.node_graph,
                      num_graphs=batch.num_graphs)
        if train:
            return model.apply(variables, batch.x, batch.node_mask, True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, batch.x, batch.node_mask, False,
                           **kwargs), {"batch_stats": stats}

    def loss_from_logits(logits, y, mask):
        if binary:
            per = bce_with_logits(logits[:, 1], y, clamp=False)
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                       axis=1)[:, 0]
        return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: FTState, batch, rng):
        def loss_fn(p):
            (logits, mut) = forward(p, state.batch_stats, batch, True, rng)
            loss = loss_from_logits(logits, batch.y, batch.graph_mask)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = _masked_grad_norm(grads, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return (FTState(params, stats, opt_state), loss, batch.y, preds,
                probs, gnorm)

    @jax.jit
    def eval_step(state: FTState, batch):
        logits, _ = forward(state.params, state.batch_stats, batch, False, None)
        loss = loss_from_logits(logits, batch.y, batch.graph_mask)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return loss, batch.y, preds, probs

    return train_step, eval_step


def make_nc_steps(model, cfg, optimizer, labels, graph, adj):
    c = config.NUM_CLASSES[cfg.domain_name]
    binary = c == 2
    # Device-resident once; passed as jit ARGUMENTS below so the large arrays
    # (features, dense adjacency) are not baked into the executables
    # (CLAUDE.md: closed-over constants ship with the remote compile).
    graph_dev = jax.device_put(graph)
    adj_dev = jax.device_put(adj)

    def forward(params, stats, g, a, train, rng):
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(adj=a, senders=g.senders, receivers=g.receivers,
                      edge_mask=g.edge_mask)
        if train:
            return model.apply(variables, g.x, g.node_mask, True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, g.x, g.node_mask, False,
                           **kwargs), {"batch_stats": stats}

    def loss_from_logits(logits, node_idx, y):
        sel = logits[node_idx]
        if binary:
            per = bce_with_logits(sel[:, 1], y, clamp=False)
        else:
            logp = jax.nn.log_softmax(sel, axis=-1)
            per = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                       axis=1)[:, 0]
        return jnp.mean(per), sel

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _train(state: FTState, node_idx, y, rng, g, a):
        def loss_fn(p):
            logits, mut = forward(p, state.batch_stats, g, a, True, rng)
            loss, sel = loss_from_logits(logits, node_idx, y)
            return loss, (sel, mut["batch_stats"])

        (loss, (sel, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = _masked_grad_norm(grads, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return FTState(params, stats, opt_state), loss, y, preds, probs, gnorm

    @jax.jit
    def _eval(state: FTState, node_idx, y, g, a):
        logits, _ = forward(state.params, state.batch_stats, g, a, False, None)
        loss, sel = loss_from_logits(logits, node_idx, y)
        probs = jax.nn.softmax(sel, axis=-1)
        preds = jnp.argmax(sel, axis=-1)
        return loss, y, preds, probs

    def train_step(state, node_idx, y, rng):
        return _train(state, node_idx, y, rng, graph_dev, adj_dev)

    def eval_step(state, node_idx, y):
        return _eval(state, node_idx, y, graph_dev, adj_dev)

    return train_step, eval_step


def make_lp_steps(model, cfg, optimizer, labels, graph, adj_train,
                  forbidden, num_hard):
    # Device-resident once; threaded through as jit arguments (see
    # make_nc_steps) — adjacency, features and the N×N forbidden mask are too
    # large to bake into executables.
    graph_dev = jax.device_put(graph)
    adj_dev = jax.device_put(adj_train)
    forbidden_dev = jax.device_put(forbidden)

    def embed(params, stats, g, a, train, rng):
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(adj=a, senders=g.senders,
                      receivers=g.receivers, edge_mask=g.edge_mask)
        if train:
            out, mut = model.apply(variables, g.x, g.node_mask, True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": rng},
                                   method=FinetuneGNN.embed, **kwargs)
            return out, mut["batch_stats"]
        out = model.apply(variables, g.x, g.node_mask, False,
                          method=FinetuneGNN.embed, **kwargs)
        return out, stats

    def score(params, stats, g, a, s, r, train, rng):
        """Returns LP *logits* (loss uses the stable BCE-with-logits form)."""
        variables = {"params": params, "batch_stats": stats}
        kwargs = dict(adj=a, senders=g.senders,
                      receivers=g.receivers, edge_mask=g.edge_mask,
                      score_senders=s, score_receivers=r, return_logits=True)
        if train:
            return model.apply(variables, g.x, g.node_mask, True,
                               mutable=["batch_stats"], rngs={"dropout": rng},
                               **kwargs)
        return model.apply(variables, g.x, g.node_mask, False,
                           **kwargs), {"batch_stats": stats}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _train(state: FTState, pos_edges, edge_mask, rng, g, a, forb):
        b = pos_edges.shape[1]
        k_emb, k_mine, k_drop = jax.random.split(rng, 3)
        # No-grad embedding in train mode: BN stats update, dropout active
        # (reference finetune.py:186-188 under model.train()).
        emb, stats = embed(state.params, state.batch_stats, g, a, True, k_emb)
        emb = jax.lax.stop_gradient(emb)
        neg_s, neg_r = mine_hard_negatives(emb, forb, k_mine,
                                           num_negatives=b, num_hard=num_hard)
        s = jnp.concatenate([pos_edges[0], neg_s])
        r = jnp.concatenate([pos_edges[1], neg_r])
        y = jnp.concatenate([jnp.ones(b), jnp.zeros(b)])
        mask = jnp.concatenate([edge_mask, edge_mask])

        def loss_fn(p):
            z, mut = score(p, stats, g, a, s, r, True, k_drop)
            loss = masked_bce_with_logits_mean(z, y, mask)
            return loss, (jax.nn.sigmoid(z), mut["batch_stats"])

        (loss, (probs, stats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = _masked_grad_norm(grads, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return (FTState(params, stats2, opt_state), loss,
                y.astype(jnp.int32), preds, probs2, mask, gnorm)

    @jax.jit
    def _eval(state: FTState, edges, y, edge_mask, g, a):
        z, _ = score(state.params, state.batch_stats, g, a, edges[0],
                     edges[1], False, None)
        probs = jax.nn.sigmoid(z)
        loss = masked_bce_with_logits_mean(z, y, edge_mask)
        preds = (probs > 0.5).astype(jnp.int32)
        probs2 = jnp.stack([1.0 - probs, probs], axis=1)
        return loss, y.astype(jnp.int32), preds, probs2

    def train_step(state, pos_edges, edge_mask, rng):
        return _train(state, pos_edges, edge_mask, rng, graph_dev, adj_dev,
                      forbidden_dev)

    def eval_step(state, edges, y, edge_mask):
        return _eval(state, edges, y, edge_mask, graph_dev, adj_dev)

    return train_step, eval_step


# ---------------------------------------------------------------------------
# Host loop
# ---------------------------------------------------------------------------


def _init_finetune_model(cfg, data, aggregation, seed):
    """Init on the host CPU backend when the default device is a remote TPU
    (init is pure param math; relay compiles would cost tens of seconds), then
    ship the tree to the device in one transfer."""
    import contextlib

    ship = jax.default_backend() != "cpu"
    ctx = (jax.default_device(jax.devices("cpu")[0]) if ship
           else contextlib.nullcontext())
    with ctx:
        model, variables = _init_finetune_model_impl(cfg, data, aggregation,
                                                     seed)
    if ship:
        variables = jax.device_put(variables, jax.devices()[0])
    return model, variables


def _init_finetune_model_impl(cfg, data, aggregation, seed):
    model = FinetuneGNN(domain_name=cfg.domain_name, aggregation=aggregation)
    # Initialization traces one forward; params are aggregation-invariant
    # (aggregation only picks the SpMM implementation), so csr — whose
    # forward needs a prebuilt BlockCSR the runner constructs later — inits
    # through the coo trace and applies with the csr model.
    init_model = (FinetuneGNN(domain_name=cfg.domain_name, aggregation="coo")
                  if aggregation == "csr" else model)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}
    if cfg.task_type == "graph_classification":
        b = data["train"].batches[0]
        variables = init_model.init(rngs, jnp.asarray(b.x), jnp.asarray(b.node_mask),
                               True, senders=jnp.asarray(b.senders),
                               receivers=jnp.asarray(b.receivers),
                               edge_mask=jnp.asarray(b.edge_mask),
                               node_graph=jnp.asarray(b.node_graph),
                               num_graphs=b.num_graphs)
    elif cfg.task_type == "node_classification":
        g = data["train"].graph
        variables = init_model.init(rngs, jnp.asarray(g.x), jnp.asarray(g.node_mask),
                               True, senders=jnp.asarray(g.senders),
                               receivers=jnp.asarray(g.receivers),
                               edge_mask=jnp.asarray(g.edge_mask))
    else:
        g = data["train"].graph
        e0 = jnp.asarray(data["train"].edges[0])
        variables = init_model.init(rngs, jnp.asarray(g.x), jnp.asarray(g.node_mask),
                               True, senders=jnp.asarray(g.senders),
                               receivers=jnp.asarray(g.receivers),
                               edge_mask=jnp.asarray(g.edge_mask),
                               score_senders=e0[0], score_receivers=e0[1])
    return model, variables


def finetune(cfg: config.FinetuneConfig, aggregation: str = "dense",
             processed_dir=None, use_wandb: bool = True,
             epochs: Optional[int] = None,
             edge_parallel: bool = False,
             node_parallel: bool = False,
             data_parallel: bool = False,
             out_root=None, fused: bool = True,
             chunk_epochs: int = 32) -> Dict[str, float]:
    from pathlib import Path

    training_start = time.time()
    epochs = epochs or cfg.epochs
    patience = int(epochs * config.FINETUNE_PATIENCE_FRACTION)
    key = jax.random.PRNGKey(cfg.seed)

    # Artifacts (checkpoints + metrics + pretrained-checkpoint lookups) all
    # resolve under out_root so smoke tests never pollute the production
    # store (VERDICT r1 weak #1).
    out_root = Path(out_root or config.OUTPUT_DIR)
    finetune_out_dir = out_root / "finetune"
    finetune_out_dir.mkdir(parents=True, exist_ok=True)

    logger = MetricLogger(config.FINETUNE_PROJECT_NAME, cfg.run_name,
                          out_dir=out_root / "metrics", use_wandb=use_wandb)

    data = {split: create_finetune_arrays(cfg.domain_name, split,
                                          cfg.batch_size,
                                          processed_dir=processed_dir)
            for split in ("val", "test", "train")}

    model, variables = _init_finetune_model(cfg, data, aggregation, cfg.seed)
    if cfg.pretrained_scheme != "b1":
        ckpt_file = (out_root / "pretrain"
                     / f"model_{cfg.pretrained_scheme}_{cfg.seed}.msgpack")
        artifact_file = (config.ARTIFACTS_DIR / "transfer"
                         / f"backbone_{cfg.pretrained_scheme}_{cfg.seed}"
                           ".msgpack")
        if ckpt_file.exists():
            ckpt = load_checkpoint(ckpt_file)
            pt_vars = {"params": ckpt["params"],
                       "batch_stats": ckpt["batch_stats"]}
        elif artifact_file.exists():
            # Fall back to the tracked compact transfer artifact (fp16
            # backbone, VERDICT r3 #2) — the analogue of the reference's
            # wandb-artifact fallback (finetune_model.py:83-125): a fresh
            # container fine-tunes with zero re-pretraining.
            from gnn_pretraining_tpu.utils.checkpoint import (
                load_transfer_artifact,
            )
            pt_vars = load_transfer_artifact(artifact_file)
        else:
            raise FileNotFoundError(
                f"pretrained checkpoint {ckpt_file} not found and no tracked "
                f"artifact at {artifact_file} — run `python run_pretrain.py "
                f"--exp_name {cfg.pretrained_scheme} --seed {cfg.seed}` first "
                "(reference resolves missing local checkpoints from wandb "
                "artifacts, finetune_model.py:83-125; here outputs/ is the "
                "scratch store and artifacts/ the durable one)")
        variables = load_pretrained_into_finetune(
            variables, pt_vars, cfg.domain_name)

    optimizer, labels, lrs = create_finetune_optimizer(variables["params"], cfg)
    state = FTState(params=variables["params"],
                    batch_stats=variables["batch_stats"],
                    opt_state=optimizer.init(variables["params"]))
    total_params, trainable_params = param_counts(variables["params"], labels)

    # Default single-chip path: scan-fused epoch runner (one dispatch per
    # E-epoch chunk — see finetune/runners.py). The per-step dispatch paths
    # below remain for the data-/edge-parallel modes.
    if fused and not (edge_parallel or node_parallel or data_parallel):
        from gnn_pretraining_tpu.finetune.runners import run_finetune_fused

        ckpt_path = finetune_out_dir / f"model_{cfg.run_name}.msgpack"
        save_checkpoint(ckpt_path, state.params, state.batch_stats, 0, {})
        test_metrics = run_finetune_fused(
            cfg, data, model, (state.params, state.batch_stats,
                               state.opt_state),
            optimizer, labels, lrs, aggregation, epochs, patience, logger,
            ckpt_path, training_start, total_params, trainable_params,
            chunk_epochs=chunk_epochs)
        from gnn_pretraining_tpu.utils.fidelity import fidelity_block

        logger.finish(extra=fidelity_block(epochs, cfg.seed, aggregation,
                                           processed_dir, (cfg.domain_name,)))
        return test_metrics

    # Build the per-task-type steps + batch iterators.
    if cfg.task_type == "graph_classification":
        if data_parallel and len(jax.devices()) > 1:
            from gnn_pretraining_tpu.data.batch import GraphStore
            from gnn_pretraining_tpu.finetune.gc_data_parallel import (
                build_sharded_gc_batches,
                make_gc_steps_data_parallel,
            )
            from gnn_pretraining_tpu.parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            mesh = make_mesh(n_data=n_dev)
            dp_model = FinetuneGNN(domain_name=cfg.domain_name,
                                   aggregation="coo", axis_name="data")
            train_step, eval_step = make_gc_steps_data_parallel(
                dp_model, cfg, optimizer, labels, mesh)
            store = GraphStore.load(
                (Path(processed_dir) if processed_dir
                 else config.PROCESSED_DIR) / f"{cfg.domain_name}.npz")
            stacked = {split: build_sharded_gc_batches(
                store, split, cfg.batch_size, n_dev)
                for split in ("train", "val", "test")}

            def train_batches():
                for b in stacked["train"]:
                    yield ("gc_dp", b)

            def eval_batches(split):
                for b in stacked[split]:
                    yield ("gc_dp", b)
        else:
            train_step, eval_step = make_gc_steps(model, cfg, optimizer,
                                                  labels)

            def train_batches():
                for b in data["train"].batches:
                    yield ("gc", b)

            def eval_batches(split):
                for b in data[split].batches:
                    yield ("gc", b)
    elif cfg.task_type == "node_classification":
        g = data["train"].graph
        if node_parallel and len(jax.devices()) > 1:
            from gnn_pretraining_tpu.finetune.node_parallel import (
                make_nc_steps_node_parallel,
            )
            from gnn_pretraining_tpu.parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            mesh = make_mesh(n_data=1, n_edge=n_dev)
            train_step, eval_step = make_nc_steps_node_parallel(
                cfg, optimizer, labels, g, mesh, n_dev)
        elif edge_parallel and len(jax.devices()) > 1:
            from gnn_pretraining_tpu.finetune.edge_parallel import (
                make_nc_steps_edge_parallel,
            )
            from gnn_pretraining_tpu.parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            mesh = make_mesh(n_data=1, n_edge=n_dev)
            ep_model = FinetuneGNN(domain_name=cfg.domain_name,
                                   aggregation="coo", edge_axis="edge")
            train_step, eval_step = make_nc_steps_edge_parallel(
                ep_model, cfg, optimizer, labels, g, mesh, n_dev)
        else:
            adj_dtype = jnp.bfloat16 if aggregation == "pallas" else jnp.float32
            adj = build_dense_adjacency(jnp.asarray(g.senders),
                                        jnp.asarray(g.receivers),
                                        jnp.asarray(g.edge_mask), g.num_nodes,
                                        dtype=adj_dtype)
            train_step, eval_step = make_nc_steps(model, cfg, optimizer,
                                                  labels, g, adj)

        def train_batches():
            d = data["train"]
            for ix, y in zip(d.node_indices, d.labels):
                yield ("nc", (jnp.asarray(ix), jnp.asarray(y)))

        def eval_batches(split):
            d = data[split]
            for ix, y in zip(d.node_indices, d.labels):
                yield ("nc", (jnp.asarray(ix), jnp.asarray(y)))
    else:
        g = data["train"].graph
        train_edges = data["train"].train_edges
        adj_dtype = jnp.bfloat16 if aggregation == "pallas" else jnp.float32
        adj_train = build_dense_adjacency(jnp.asarray(g.senders),
                                          jnp.asarray(g.receivers),
                                          jnp.asarray(g.edge_mask),
                                          g.num_nodes, dtype=adj_dtype)
        real_n = int(np.asarray(g.node_mask).sum())
        forbidden = build_forbidden_mask(g.num_nodes, train_edges,
                                         node_mask=g.node_mask)
        n_cand = candidate_count(g.num_nodes, train_edges,
                                 num_real_nodes=real_n)
        num_hard = hard_count(n_cand, cfg.batch_size)
        if node_parallel and len(jax.devices()) > 1:
            from gnn_pretraining_tpu.finetune.node_parallel import (
                make_lp_steps_node_parallel,
            )
            from gnn_pretraining_tpu.parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            mesh = make_mesh(n_data=1, n_edge=n_dev)
            train_step, eval_step = make_lp_steps_node_parallel(
                cfg, optimizer, labels, g, mesh, n_dev, forbidden, num_hard)
        elif edge_parallel and len(jax.devices()) > 1:
            from gnn_pretraining_tpu.finetune.edge_parallel import (
                make_lp_steps_edge_parallel,
            )
            from gnn_pretraining_tpu.parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            mesh = make_mesh(n_data=1, n_edge=n_dev)
            ep_model = FinetuneGNN(domain_name=cfg.domain_name,
                                   aggregation="coo", edge_axis="edge")
            train_step, eval_step = make_lp_steps_edge_parallel(
                ep_model, cfg, optimizer, labels, g, mesh, n_dev,
                forbidden, num_hard)
        else:
            train_step, eval_step = make_lp_steps(model, cfg, optimizer,
                                                  labels, g, adj_train,
                                                  forbidden, num_hard)

        def train_batches():
            d = data["train"]
            for e, m in zip(d.edges, d.edge_mask):
                yield ("lp_train", (jnp.asarray(e), jnp.asarray(m)))

        def eval_batches(split):
            d = data[split]
            for e, y, m in zip(d.edges, d.labels, d.edge_mask):
                yield ("lp_eval", (jnp.asarray(e), jnp.asarray(y), jnp.asarray(m)))

    ckpt_path = finetune_out_dir / f"model_{cfg.run_name}.msgpack"
    save_checkpoint(ckpt_path, state.params, state.batch_stats, 0, {})

    # Per-cell throughput telemetry (real mask-valid edges per train step).
    if cfg.task_type == "graph_classification":
        ems = [np.asarray(b.edge_mask).sum() for b in data["train"].batches]
        edges_per_step = float(np.sum(ems) / max(len(ems), 1))
    else:
        edges_per_step = float(np.asarray(data["train"].graph.edge_mask).sum())

    def run_eval_pass(split, epoch):
        batch_metrics = []
        all_y, all_p = [], []
        for kind, payload in eval_batches(split):
            if kind == "gc_dp":
                out = eval_step(state, payload)
                loss, y, preds, probs, mask = jax.device_get(out)
                valid = np.asarray(mask) > 0
            elif kind == "gc":
                b = payload
                out = eval_step(state, b)
                loss, y, preds, probs = jax.device_get(out)
                valid = np.asarray(b.graph_mask) > 0
            elif kind == "nc":
                ix, y_in = payload
                out = eval_step(state, ix, y_in)
                loss, y, preds, probs = jax.device_get(out)
                valid = np.ones(len(np.asarray(y)), bool)
            else:
                e, y_in, m = payload
                out = eval_step(state, e, y_in, m)
                loss, y, preds, probs = jax.device_get(out)
                valid = np.asarray(m) > 0
            bm = M.compute_batch_metrics(
                cfg.domain_name, np.asarray(y)[valid],
                np.asarray(preds)[valid], np.asarray(probs)[valid],
                float(loss), split)
            batch_metrics.append(bm)
            all_y.append(np.asarray(y)[valid])
            all_p.append(np.asarray(probs)[valid])
        global_auc = M.compute_global_auc(cfg.domain_name,
                                          np.concatenate(all_y),
                                          np.concatenate(all_p), split)
        return batch_metrics, global_auc

    best_val = -float("inf")
    epochs_since_improvement = 0
    global_step = 0
    sel_key = "val/auc" if cfg.task_type == "link_prediction" else "val/accuracy"

    epoch = 0
    t_loop = time.time()
    for epoch in range(1, epochs + 1):
        for kind, payload in train_batches():
            step_start = time.time()
            global_step += 1
            key, sub = jax.random.split(key)
            if kind == "gc_dp":
                state, *rest = train_step(state, payload, sub)
                loss, y, preds, probs, mask, gnorm = jax.device_get(rest)
                valid = np.asarray(mask) > 0
            elif kind == "gc":
                b = payload
                state, *rest = train_step(state, b, sub)
                loss, y, preds, probs, gnorm = jax.device_get(rest)
                valid = np.asarray(b.graph_mask) > 0
            elif kind == "nc":
                ix, y_in = payload
                state, *rest = train_step(state, ix, y_in, sub)
                loss, y, preds, probs, gnorm = jax.device_get(rest)
                valid = np.ones(len(np.asarray(y)), bool)
            else:
                e, m = payload
                state, *rest = train_step(state, e, m, sub)
                loss, y, preds, probs, mask, gnorm = jax.device_get(rest)
                valid = np.asarray(mask) > 0
            tm = M.compute_training_metrics(
                epoch, global_step, float(loss), lrs, cfg.domain_name,
                np.asarray(y)[valid], np.asarray(preds)[valid],
                np.asarray(probs)[valid], step_start, float(gnorm))
            logger.log(tm, step=global_step)

        val_bm, val_gauc = run_eval_pass("val", epoch)
        val_metrics = M.compute_validation_metrics(val_bm, epoch)
        val_metrics.update(val_gauc)
        logger.log(val_metrics, step=global_step)

        if val_metrics[sel_key] > best_val:
            best_val = val_metrics[sel_key]
            epochs_since_improvement = 0
            save_checkpoint(ckpt_path, state.params, state.batch_stats, epoch,
                            val_metrics)
        else:
            epochs_since_improvement += 1
        if epochs_since_improvement >= patience:
            break
    loop_wall = time.time() - t_loop

    # Reload best and run the test pass (reference :415-433).
    best = load_checkpoint(ckpt_path)
    state = FTState(params=best["params"], batch_stats=best["batch_stats"],
                    opt_state=state.opt_state)
    test_bm, test_gauc = run_eval_pass("test", epoch)
    test_metrics = M.compute_test_metrics(
        test_bm, epoch, epochs_since_improvement, training_start,
        total_params, trainable_params,
        train_steps=global_step, train_wall=loop_wall,
        edges_per_step=edges_per_step)
    test_metrics.update(test_gauc)
    logger.log(test_metrics, step=global_step)
    from gnn_pretraining_tpu.utils.fidelity import fidelity_block

    logger.finish(extra=fidelity_block(epochs, cfg.seed, aggregation,
                                       processed_dir, (cfg.domain_name,)))
    return test_metrics


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--domain_name", type=str, required=True)
    parser.add_argument("--finetune_strategy", type=str, required=True)
    parser.add_argument("--pretrained_scheme", type=str, required=True)
    parser.add_argument("--seed", type=int, required=True)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--aggregation", type=str, default="pallas",
                        choices=["dense", "pallas", "coo", "csr"])
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--edge_parallel", action="store_true",
                        help="shard the graph's edges over all devices "
                             "(node/link tasks)")
    parser.add_argument("--node_parallel", action="store_true",
                        help="shard the graph's node rows over all devices "
                             "(halo-exchange aggregation; node/link tasks)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batch graphs over all devices "
                             "(graph classification)")
    args = parser.parse_args()
    cfg = config.FinetuneConfig(domain_name=args.domain_name,
                                finetune_strategy=args.finetune_strategy,
                                pretrained_scheme=args.pretrained_scheme,
                                seed=args.seed)
    result = finetune(cfg, aggregation=args.aggregation, epochs=args.epochs,
                      use_wandb=not args.no_wandb,
                      edge_parallel=args.edge_parallel,
                      node_parallel=args.node_parallel,
                      data_parallel=args.data_parallel)
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in result.items()})


if __name__ == "__main__":
    main()
