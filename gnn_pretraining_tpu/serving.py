"""Deployment/serving export: AOT-compiled inference artifacts via jax.export.

The reference has no serving story (training scripts only); this module turns
a fine-tuned model into a self-contained StableHLO artifact that any JAX
runtime — or PjRt directly — can execute without the framework, Python model
code, or flax being present. Weights are baked into the artifact as
constants; inputs are the padded static-shape arrays the framework already
standardizes on (CLAUDE.md "static shapes everywhere"), so one artifact per
padding bucket, compiled once, serves forever.

Per task type the exported callable takes / returns
(`models/finetune_model.py` eval semantics, train=False, dropout off):

  * graph_classification: (x, node_mask, senders, receivers, edge_mask,
    node_graph) -> [num_graphs, C] logits
  * node_classification:  (x, node_mask, senders, receivers, edge_mask)
    -> [N, C] logits
  * link_prediction:      (x, node_mask, senders, receivers, edge_mask,
    score_senders, score_receivers) -> [S] probabilities

Cross-platform: ``platforms=("tpu", "cpu")`` lowers for both targets from any
host (jax.export cross-lowering), so CI can validate the exact artifact that
ships to TPU serving. Only the XLA aggregation paths ("dense"/"coo") are
exportable — a Pallas kernel would pin the artifact to one platform and is
a training-side optimization anyway.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN


def make_serving_fn(model: FinetuneGNN, variables: Dict[str, Any]
                    ) -> Tuple[Callable, Tuple[str, ...]]:
    """Eval-mode closure over the weights + its positional input names.

    For graph classification the first element is a *factory*
    ``make(num_graphs) -> fn`` (the padded graph count is a static shape
    argument); for the other task types it is the serving ``fn`` itself.
    ``export_serving`` handles both."""
    task_type = config.TASK_TYPES[model.domain_name]
    frozen = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}

    if task_type == "graph_classification":
        names = ("x", "node_mask", "senders", "receivers", "edge_mask",
                 "node_graph")

        # num_graphs is a static argument of segment_mean; export_serving
        # binds it from the example's padded graph count at export time.
        def make(num_graphs: int):
            def fn(x, node_mask, senders, receivers, edge_mask, node_graph):
                return model.apply(frozen, x, node_mask, False,
                                   senders=senders, receivers=receivers,
                                   edge_mask=edge_mask, node_graph=node_graph,
                                   num_graphs=num_graphs)
            return fn

        return make, names

    if task_type == "node_classification":
        names = ("x", "node_mask", "senders", "receivers", "edge_mask")

        def fn(x, node_mask, senders, receivers, edge_mask):
            return model.apply(frozen, x, node_mask, False, senders=senders,
                               receivers=receivers, edge_mask=edge_mask)

        return fn, names

    if task_type == "link_prediction":
        names = ("x", "node_mask", "senders", "receivers", "edge_mask",
                 "score_senders", "score_receivers")

        def fn(x, node_mask, senders, receivers, edge_mask, score_senders,
               score_receivers):
            return model.apply(frozen, x, node_mask, False, senders=senders,
                               receivers=receivers, edge_mask=edge_mask,
                               score_senders=score_senders,
                               score_receivers=score_receivers)

        return fn, names

    raise ValueError(task_type)


def make_embedding_fn(model: FinetuneGNN, variables: Dict[str, Any]
                      ) -> Tuple[Callable, Tuple[str, ...]]:
    """Representation serving: encoder + backbone → [N, 256] node embeddings
    (``FinetuneGNN.embed``), the natural deployment of a pretrained backbone
    — downstream heads can live in the application."""
    frozen = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    names = ("x", "node_mask", "senders", "receivers", "edge_mask")

    def fn(x, node_mask, senders, receivers, edge_mask):
        return model.apply(frozen, x, node_mask, False, senders=senders,
                           receivers=receivers, edge_mask=edge_mask,
                           method=model.embed)

    return fn, names


def export_serving(model: FinetuneGNN, variables: Dict[str, Any],
                   example: Dict[str, Any],
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   embed_only: bool = False) -> bytes:
    """Serialize an AOT inference artifact for ``example``'s padded shapes.

    ``example`` maps the task type's input names (see module docstring) to
    arrays; for graph classification it must also carry ``num_graphs`` (a
    static int — the padded graph count of the serving bucket). With
    ``embed_only`` the artifact returns node embeddings instead of task
    outputs.
    """
    if model.aggregation not in ("dense", "coo"):
        raise ValueError(
            f"aggregation={model.aggregation!r} is not exportable; build the "
            "serving model with 'dense' or 'coo' (XLA) aggregation")
    example = dict(example)
    if embed_only:
        fn, names = make_embedding_fn(model, variables)
    else:
        fn, names = make_serving_fn(model, variables)
        if config.TASK_TYPES[model.domain_name] == "graph_classification":
            fn = fn(int(example.pop("num_graphs")))
    args = tuple(jnp.asarray(example[n]) for n in names)
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        *args)
    return bytes(exported.serialize())


def load_serving(blob: bytes) -> Callable:
    """Rehydrate an artifact into a jit-callable inference function."""
    exported = jax_export.deserialize(bytearray(blob))
    return jax.jit(exported.call)


def save_artifact(path, blob: bytes) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(blob)
    tmp.replace(path)


def load_artifact(path) -> Callable:
    return load_serving(Path(path).read_bytes())
