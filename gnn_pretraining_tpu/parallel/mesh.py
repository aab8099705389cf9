"""Mesh construction helpers.

The framework uses two named axes (SURVEY.md §5 "distributed communication
backend"):

  * ``data``  — data parallelism: graphs of a batch (and sweep cells across
    hosts) are sharded over it;
  * ``edge``  — edge partitioning: the COO edge list of a large graph is
    sharded over it and per-node partial aggregations are psum-combined.

Collectives ride ICI inside a slice; ``jax.distributed.initialize`` extends
the same program to multi-host (DCN) without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: Optional[int] = None, n_edge: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_edge
    if n_data * n_edge > len(devices):
        raise ValueError(f"mesh {n_data}x{n_edge} needs {n_data * n_edge} "
                         f"devices, only {len(devices)} available")
    dev_array = np.array(devices[: n_data * n_edge]).reshape(n_data, n_edge)
    return Mesh(dev_array, axis_names=("data", "edge"))
