"""Device-resident graph batch format: padded, masked, static shapes.

Replaces PyG's ``Batch``/``ptr`` dynamic re-batching (reference:
src/data/pretrain_data_loaders.py:41, Batch.from_data_list) with a fixed-shape
pytree so every train/eval step hits one compiled XLA program:

  * nodes of the batched graphs are concatenated then zero-padded to ``n_pad``;
  * edges likewise to ``e_pad`` (COO, both directions present for undirected
    data, matching the PyG datasets);
  * per-graph slots padded to ``g_pad``;
  * validity masks carry the dynamic sizes.

Padding rows have mask 0 and graph id 0; every op in ``ops/`` takes the masks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np
from flax import struct


def pad_to(x: np.ndarray, size: int, axis: int = 0, value=0) -> np.ndarray:
    pad = size - x.shape[axis]
    if pad < 0:
        raise ValueError(f"cannot pad axis {axis} of {x.shape} to {size}")
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value)


def round_up(x: int, m: int = 8) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class GraphBatch:
    """A padded multi-graph batch (all leaves jax/numpy arrays, static shapes)."""

    x: np.ndarray               # [N, D] f32 node features
    senders: np.ndarray         # [E] i32 global src node id (padding: 0)
    receivers: np.ndarray       # [E] i32 global dst node id (padding: 0)
    edge_mask: np.ndarray       # [E] f32 1.0 for real edges
    edge_graph: np.ndarray      # [E] i32 graph id per edge (padding: 0)
    node_mask: np.ndarray       # [N] f32 1.0 for real nodes
    node_graph: np.ndarray      # [N] i32 graph id per node (padding: 0)
    graph_mask: np.ndarray      # [G] f32 1.0 for real graphs
    node_start: np.ndarray      # [G] i32 first global node id of each graph
    n_node: np.ndarray          # [G] i32 valid node count per graph
    n_edge: np.ndarray          # [G] i32 valid edge count per graph
    y: np.ndarray               # [G] i32 graph labels (0 where absent)
    graph_properties: np.ndarray  # [G, P] f32 standardized targets (0 where absent)

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]


@dataclasses.dataclass
class GraphStore:
    """Host-side ragged storage of one dataset (numpy; saved as .npz).

    Mirrors the content of the reference's ``data/processed/<name>/{data.pt,
    splits.pt, graph_properties.pt}`` (src/data/data_setup.py:66-72) in a
    torch-free layout: node/edge arrays concatenated with offset tables.
    """

    name: str
    node_features: np.ndarray       # [sumN, D] f32
    edge_index: np.ndarray          # [2, sumE] i32 (global per-graph-local ids)
    node_offsets: np.ndarray        # [G+1] i64
    edge_offsets: np.ndarray        # [G+1] i64
    y: np.ndarray                   # [G] i64 graph labels (or [N] node labels for Planetoid)
    splits: Dict[str, np.ndarray]
    graph_properties: Optional[np.ndarray] = None  # [G, 12] f32
    node_y: Optional[np.ndarray] = None            # [sumN] node labels (Planetoid)
    # Provenance recorded by data/setup.py: {"source": "raw"|"synthetic",
    # "scale": "<float>"}. Run summaries embed this so completion markers can
    # distinguish a production cell from a smoke run on stand-in data.
    meta: Dict[str, str] = dataclasses.field(default_factory=dict)

    @property
    def num_graphs(self) -> int:
        return len(self.node_offsets) - 1

    def graph_num_nodes(self, i: int) -> int:
        return int(self.node_offsets[i + 1] - self.node_offsets[i])

    def graph_num_edges(self, i: int) -> int:
        return int(self.edge_offsets[i + 1] - self.edge_offsets[i])

    def graph(self, i: int):
        """(features, local edge_index) of graph ``i`` (edges are 0-based)."""
        n0, n1 = self.node_offsets[i], self.node_offsets[i + 1]
        e0, e1 = self.edge_offsets[i], self.edge_offsets[i + 1]
        return self.node_features[n0:n1], self.edge_index[:, e0:e1]

    def max_nodes(self) -> int:
        return int(np.max(np.diff(self.node_offsets)))

    def max_edges(self) -> int:
        return int(np.max(np.diff(self.edge_offsets)))

    # -- persistence ---------------------------------------------------------

    def save(self, path) -> None:
        arrays = {
            "node_features": self.node_features,
            "edge_index": self.edge_index,
            "node_offsets": self.node_offsets,
            "edge_offsets": self.edge_offsets,
            "y": self.y,
        }
        if self.graph_properties is not None:
            arrays["graph_properties"] = self.graph_properties
        if self.node_y is not None:
            arrays["node_y"] = self.node_y
        for k, v in self.splits.items():
            arrays[f"split__{k}"] = v
        for k, v in self.meta.items():
            arrays[f"meta__{k}"] = np.array(str(v))
        np.savez_compressed(path, name=np.array(self.name), **arrays)

    @classmethod
    def load(cls, path) -> "GraphStore":
        z = np.load(path, allow_pickle=False)
        splits = {k[len("split__"):]: z[k] for k in z.files if k.startswith("split__")}
        meta = {k[len("meta__"):]: str(z[k]) for k in z.files
                if k.startswith("meta__")}
        return cls(
            meta=meta,
            name=str(z["name"]),
            node_features=z["node_features"],
            edge_index=z["edge_index"],
            node_offsets=z["node_offsets"],
            edge_offsets=z["edge_offsets"],
            y=z["y"],
            splits=splits,
            graph_properties=z["graph_properties"] if "graph_properties" in z.files else None,
            node_y=z["node_y"] if "node_y" in z.files else None,
        )


try:  # native fused builder (native/batcher.cc); numpy fallback below
    import _gnn_batcher as _native_batcher
except ImportError:
    _native_batcher = None


def build_batch(store: GraphStore, graph_indices: Sequence[int],
                n_pad: int, e_pad: int, g_pad: int,
                with_properties: bool = False) -> GraphBatch:
    """Concatenate the selected graphs into one padded GraphBatch (host/numpy
    or the native C++ builder when built — same output, parity-tested).

    Equivalent of ``Batch.from_data_list`` with local->global edge relabeling
    (reference: src/data/pretrain_data_loaders.py:41), plus zero padding.
    """
    if _native_batcher is not None and len(graph_indices) > 0:
        idx = np.ascontiguousarray(np.asarray(graph_indices, np.int64))
        props = store.graph_properties if (
            with_properties and store.graph_properties is not None) else None
        out = _native_batcher.build_batch(
            store.node_features, np.ascontiguousarray(store.edge_index, np.int64),
            store.node_offsets.astype(np.int64),
            store.edge_offsets.astype(np.int64),
            np.ascontiguousarray(store.y, np.int64),
            props, idx, int(n_pad), int(e_pad), int(g_pad),
            bool(with_properties and props is not None))
        (x, senders, receivers, edge_mask, edge_graph, node_mask, node_graph,
         graph_mask, node_start, n_node, n_edge, y, gprops) = out
        return GraphBatch(x=x, senders=senders, receivers=receivers,
                          edge_mask=edge_mask, edge_graph=edge_graph,
                          node_mask=node_mask, node_graph=node_graph,
                          graph_mask=graph_mask, node_start=node_start,
                          n_node=n_node, n_edge=n_edge, y=y,
                          graph_properties=gprops)
    return _build_batch_numpy(store, graph_indices, n_pad, e_pad, g_pad,
                              with_properties)


def _build_batch_numpy(store: GraphStore, graph_indices: Sequence[int],
                       n_pad: int, e_pad: int, g_pad: int,
                       with_properties: bool = False) -> GraphBatch:
    """Pure-numpy reference implementation of ``build_batch``."""
    g = len(graph_indices)
    if g > g_pad:
        raise ValueError(f"{g} graphs > g_pad={g_pad}")

    d = store.node_features.shape[1]
    if g == 0:
        # All-padding batch (a device shard can receive zero graphs when a
        # ragged tail is split across more devices than graphs).
        p0 = store.graph_properties.shape[1] if store.graph_properties is not None else 12
        return GraphBatch(
            x=np.zeros((n_pad, d), np.float32),
            senders=np.zeros(e_pad, np.int32),
            receivers=np.zeros(e_pad, np.int32),
            edge_mask=np.zeros(e_pad, np.float32),
            edge_graph=np.zeros(e_pad, np.int32),
            node_mask=np.zeros(n_pad, np.float32),
            node_graph=np.zeros(n_pad, np.int32),
            graph_mask=np.zeros(g_pad, np.float32),
            node_start=np.zeros(g_pad, np.int32),
            n_node=np.zeros(g_pad, np.int32),
            n_edge=np.zeros(g_pad, np.int32),
            y=np.zeros(g_pad, np.int32),
            graph_properties=np.zeros((g_pad, p0), np.float32))
    p = store.graph_properties.shape[1] if store.graph_properties is not None else 12

    xs: List[np.ndarray] = []
    send: List[np.ndarray] = []
    recv: List[np.ndarray] = []
    edge_graph: List[np.ndarray] = []
    node_graph: List[np.ndarray] = []
    node_start = np.zeros(g_pad, np.int32)
    n_node = np.zeros(g_pad, np.int32)
    n_edge = np.zeros(g_pad, np.int32)
    y = np.zeros(g_pad, np.int32)
    props = np.zeros((g_pad, p), np.float32)

    cursor = 0
    for slot, gi in enumerate(graph_indices):
        n0, n1 = store.node_offsets[gi], store.node_offsets[gi + 1]
        e0, e1 = store.edge_offsets[gi], store.edge_offsets[gi + 1]
        nn, ne = int(n1 - n0), int(e1 - e0)
        xs.append(store.node_features[n0:n1])
        ei = store.edge_index[:, e0:e1].astype(np.int64)
        send.append(ei[0] + cursor)
        recv.append(ei[1] + cursor)
        edge_graph.append(np.full(ne, slot, np.int32))
        node_graph.append(np.full(nn, slot, np.int32))
        node_start[slot] = cursor
        n_node[slot] = nn
        n_edge[slot] = ne
        if store.y.shape[0] == store.num_graphs:
            y[slot] = store.y[gi]
        if with_properties and store.graph_properties is not None:
            props[slot] = store.graph_properties[gi]
        cursor += nn

    total_n = cursor
    total_e = int(sum(a.shape[0] for a in send))
    if total_n > n_pad or total_e > e_pad:
        raise ValueError(f"batch ({total_n} nodes, {total_e} edges) exceeds "
                         f"padding ({n_pad}, {e_pad})")

    x = pad_to(np.concatenate(xs, 0).astype(np.float32), n_pad)
    senders = pad_to(np.concatenate(send).astype(np.int32), e_pad)
    receivers = pad_to(np.concatenate(recv).astype(np.int32), e_pad)
    e_graph = pad_to(np.concatenate(edge_graph), e_pad)
    n_graph = pad_to(np.concatenate(node_graph), n_pad)
    edge_mask = pad_to(np.ones(total_e, np.float32), e_pad)
    node_mask = pad_to(np.ones(total_n, np.float32), n_pad)
    graph_mask = pad_to(np.ones(g, np.float32), g_pad)

    return GraphBatch(
        x=x, senders=senders, receivers=receivers, edge_mask=edge_mask,
        edge_graph=e_graph, node_mask=node_mask, node_graph=n_graph,
        graph_mask=graph_mask, node_start=node_start, n_node=n_node,
        n_edge=n_edge, y=y, graph_properties=props)
