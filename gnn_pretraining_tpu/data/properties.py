"""The 12 structural graph-property targets.

Same definitions and edge-case handling as the reference
(src/data/graph_properties.py:17-78): computed on the simple undirected graph
(self-loops removed), z-scored with a StandardScaler fit on the *train* rows
only, zero-variance columns clamped to scale 1 (src/data/graph_properties.py:
88-96). Offline/host-side code — runs once during preprocessing.
"""

from __future__ import annotations

import math

import networkx as nx
import numpy as np

GRAPH_PROPERTY_DIM = 12


def compute_graph_properties(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """12-dim property vector of one graph given its (local) edge_index."""
    g = nx.Graph()
    g.add_nodes_from(range(num_nodes))
    if edge_index.size:
        mask = edge_index[0] != edge_index[1]  # remove self loops
        g.add_edges_from(zip(edge_index[0][mask].tolist(),
                             edge_index[1][mask].tolist()))

    n = g.number_of_nodes()
    e = g.number_of_edges()

    degrees = np.array([d for _, d in g.degree()], dtype=float)
    deg_mean = float(degrees.mean()) if n else 0.0
    deg_var = float(degrees.var()) if n else 0.0
    deg_max = float(degrees.max()) if n else 0.0

    density = float(nx.density(g))
    clustering_global = float(nx.average_clustering(g)) if n else 0.0
    transitivity = float(nx.transitivity(g)) if n > 2 else 0.0
    num_components = float(nx.number_connected_components(g))

    try:
        largest = max(nx.connected_components(g), key=len)
        diameter = float(nx.diameter(g.subgraph(largest).copy()))
    except (nx.NetworkXError, ValueError):
        diameter = 0.0

    if deg_var == 0.0:
        assortativity = 0.0
    else:
        assortativity = float(nx.degree_assortativity_coefficient(g))
        if math.isnan(assortativity) or math.isinf(assortativity):
            assortativity = 0.0

    if n > 2:
        degree_centralization = float((degrees.max() - degrees).sum()) / ((n - 1) * (n - 2))
    else:
        degree_centralization = 0.0

    return np.array([
        float(n), float(e), density, deg_mean, deg_var, deg_max,
        clustering_global, transitivity, num_components, diameter,
        assortativity, degree_centralization,
    ], dtype=np.float32)


def standardize_properties(all_props: np.ndarray, train_idx: np.ndarray) -> np.ndarray:
    """Z-score with mean/std fit on train rows; zero-std columns get scale 1."""
    train = all_props[train_idx]
    mean = train.mean(axis=0)
    # sklearn StandardScaler uses the biased (ddof=0) std.
    scale = train.std(axis=0)
    scale = np.where(scale == 0.0, 1.0, scale)
    return ((all_props - mean) / scale).astype(np.float32)
