"""GSPMD tensor parallelism for the GIN backbone's MLPs.

Shards every GIN MLP's hidden (2×256) dimension over a ``model`` mesh axis
purely with sharding annotations — the existing flax ``model.apply`` runs
unchanged under ``jit`` and XLA/GSPMD inserts the collectives. Per layer:

  * ``mlp_0`` kernel [256, 512] is column-sharded ``P(None, 'model')`` and its
    bias ``P('model')`` — each device computes a [N, 512/k] activation slice;
  * ``mlp_bn`` (the BN between the two linears) is per-feature over nodes, so
    its scale/bias and running stats shard ``P('model')`` and the normalization
    needs **no** communication;
  * ``mlp_1`` kernel [512, 256] is row-sharded ``P('model', None)``: the
    partial [N, 256] products are all-reduced (one collective per layer,
    riding ICI), bias stays replicated.

Everything else (input encoders, eps, residual BNs, heads) is replicated.
This is the "How to Scale Your Model" recipe: pick a mesh, annotate the
params, let the partitioner do the rest. It composes with data parallelism —
on a ``('data', 'model')`` mesh the same specs apply unchanged while batch
rows shard over ``data``.

At the reference's 256-hidden configuration a single chip is the right
choice; this mode exists so the framework scales the same model family to
hidden sizes where one chip's HBM or FLOPs no longer suffice. The reference
has no distributed backend at all (SURVEY.md §5 — net-new capability).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_model: Optional[int] = None, n_data: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A ``('data', 'model')`` mesh; by default all devices go to ``model``."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model is None:
        n_model = len(devices) // n_data
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n_data * n_model} "
                         f"devices, only {len(devices)} available")
    dev_array = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def _path_names(path) -> list:
    out = []
    for k in path:
        out.append(getattr(k, "key", None) or getattr(k, "name", None)
                   or str(k))
    return out


def tp_specs(tree: Any) -> Any:
    """PartitionSpec pytree for a params or batch_stats collection.

    Works on any pytree containing the backbone: specs are keyed on the
    ``mlp_0`` / ``mlp_bn`` / ``mlp_1`` module names wherever they appear
    (PretrainableGNN, FinetuneGNN, or a bare GINBackbone)."""

    def spec_for(path, leaf):
        names = _path_names(path)
        if "mlp_0" in names:
            return P(None, "model") if leaf.ndim == 2 else P("model")
        if "mlp_bn" in names:
            return P("model")
        if "mlp_1" in names and leaf.ndim == 2:
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """Place a flax variables dict (params + batch_stats + ...) on ``mesh``
    with the tensor-parallel layout. Leaves not matched by ``tp_specs`` are
    replicated, so the result is safe to use in any jitted step."""
    specs = tp_specs(variables)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables, specs)
