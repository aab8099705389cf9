"""Offline preprocessing: raw (or synthetic) datasets → GraphStore .npz files.

Behavioural port of the reference pipeline (src/data/data_setup.py:66-178):
same split rules, same seeds, same scaling/clipping, same graph-property
standardization.

  * Downstream TU sets (ENZYMES, PTC_MR): stratified 80/10/10 with
    RANDOM_SEED=42 (src/data/data_setup.py:84-110).
  * Pretrain-only TU sets: 90/10 ShuffleSplit (src/data/data_setup.py:114-121).
  * Continuous-feature sets (PROTEINS, ENZYMES): StandardScaler fit on train
    node rows, clipped to ±3 (src/data/data_setup.py:90-100).
  * Planetoid NC: the public masks; LP: seeded 80/10/10 edge permutation with
    sampled negatives (src/data/data_setup.py:126-165).

If the real raw files are missing (zero-egress build), seeded synthetic
datasets with matched shapes are generated instead (data/synthetic.py).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from sklearn.model_selection import ShuffleSplit, StratifiedShuffleSplit

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data import synthetic
from gnn_pretraining_tpu.data.batch import GraphStore
from gnn_pretraining_tpu.data.parsers import parse_planetoid, parse_tu_dataset
from gnn_pretraining_tpu.data.properties import (
    compute_graph_properties,
    standardize_properties,
)


def _scale_continuous_features(store_feats: np.ndarray, node_offsets: np.ndarray,
                               train_idx: np.ndarray) -> np.ndarray:
    """StandardScaler fit on train-graph node rows; clip to ±3 (ref :90-100)."""
    rows = np.concatenate([
        np.arange(node_offsets[i], node_offsets[i + 1]) for i in train_idx])
    train_x = store_feats[rows]
    mean = train_x.mean(axis=0)
    scale = train_x.std(axis=0)  # sklearn ddof=0
    scale = np.where(scale == 0.0, 1.0, scale)
    scaled = (store_feats - mean) / scale
    return np.clip(scaled, config.MIN_SCALE, config.MAX_SCALE).astype(np.float32)


def _stratified_or_plain(indices: np.ndarray, labels: np.ndarray,
                         test_size: float):
    """Stratified split like the reference (:86,102); falls back to a plain
    ShuffleSplit only when a class is too small for stratification — which can
    only happen on undersized *synthetic* stand-in data, never the real sets."""
    try:
        sss = StratifiedShuffleSplit(n_splits=1, test_size=test_size,
                                     random_state=config.PREPROCESS_RANDOM_SEED)
        return next(sss.split(indices, labels))
    except ValueError:
        ss = ShuffleSplit(n_splits=1, test_size=test_size,
                          random_state=config.PREPROCESS_RANDOM_SEED)
        return next(ss.split(indices))


def _compute_properties(edge_index: np.ndarray, node_offsets: np.ndarray,
                        edge_offsets: np.ndarray, train_idx: np.ndarray) -> np.ndarray:
    g = len(node_offsets) - 1
    props = np.zeros((g, config.GRAPH_PROPERTY_DIM), np.float32)
    for i in range(g):
        n = int(node_offsets[i + 1] - node_offsets[i])
        ei = edge_index[:, edge_offsets[i]:edge_offsets[i + 1]]
        props[i] = compute_graph_properties(np.asarray(ei, np.int64), n)
    return standardize_properties(props, train_idx)


def process_tu_dataset(name: str, raw_dir: Path, synthetic_scale: float = 1.0,
                       synthetic_seed: int = 0,
                       synthetic_homophily: float = 0.0) -> GraphStore:
    try:
        x, ei, n_off, e_off, y = parse_tu_dataset(raw_dir, name)
        source = "raw"
    except FileNotFoundError:
        x, ei, n_off, e_off, y = synthetic.generate_tu_dataset(
            name, seed=synthetic_seed, scale=synthetic_scale,
            homophily=synthetic_homophily)
        source = "synthetic"

    num_graphs = len(n_off) - 1
    needs_pretrain = name in config.PRETRAIN_TUDATASETS
    needs_downstream = name in config.DOWNSTREAM_TUDATASETS

    if needs_downstream:
        train_idx, val_test_idx = _stratified_or_plain(
            np.arange(num_graphs), y, config.VAL_TEST_FRACTION)

        if name in config.CONTINUOUS_TUDATASETS:
            x = _scale_continuous_features(x, n_off, train_idx)

        val_rel, test_rel = _stratified_or_plain(
            np.arange(len(val_test_idx)), y[val_test_idx],
            config.VAL_TEST_SPLIT_RATIO)
        splits = {"train": train_idx.astype(np.int64),
                  "val": val_test_idx[val_rel].astype(np.int64),
                  "test": val_test_idx[test_rel].astype(np.int64)}
    else:
        ss = ShuffleSplit(n_splits=1, test_size=config.VAL_FRACTION,
                          random_state=config.PREPROCESS_RANDOM_SEED)
        train_idx, val_idx = next(ss.split(np.arange(num_graphs)))
        splits = {"train": train_idx.astype(np.int64),
                  "val": val_idx.astype(np.int64)}

    props = (_compute_properties(ei, n_off, e_off, splits["train"])
             if needs_pretrain else None)

    print(f"  {name}: {num_graphs} graphs ({source}), splits "
          f"{ {k: len(v) for k, v in splits.items()} }")
    return GraphStore(name=name, node_features=x, edge_index=ei,
                      node_offsets=n_off, edge_offsets=e_off, y=y,
                      splits=splits, graph_properties=props,
                      meta={"source": source,
                            "scale": str(synthetic_scale if source == "synthetic"
                                         else 1.0),
                            "homophily": str(synthetic_homophily
                                             if source == "synthetic" else 0.0)})


def _create_link_prediction_splits(edge_index: np.ndarray, num_nodes: int,
                                   seed: int = config.PREPROCESS_RANDOM_SEED
                                   ) -> Dict[str, np.ndarray]:
    """80/10/10 edge split with sampled negatives (ref :126-149).

    Uses ``torch.randperm`` (when torch is installed) for the edge
    permutation so that the split is bit-identical to the reference's when run
    on the same real data; otherwise falls back to a seeded numpy permutation
    (identical methodology, different stream).
    """
    num_edges = edge_index.shape[1]
    num_val_test = int(num_edges * config.VAL_TEST_FRACTION)
    num_val = int(num_val_test * config.VAL_TEST_SPLIT_RATIO)

    try:
        import torch  # host-side only, for RNG-stream parity with the reference

        gen = torch.Generator()
        gen.manual_seed(seed)
        perm = torch.randperm(num_edges, generator=gen).numpy()
    except ImportError:
        perm = np.random.default_rng(seed).permutation(num_edges)
    train_edges = edge_index[:, perm[num_val_test:]]
    val_test_edges = edge_index[:, perm[:num_val_test]]

    # Negatives: uniform non-edges w.r.t. to_undirected(train_edges)
    # (PyG negative_sampling semantics; sampling stream is ours).
    existing = set()
    for u, v in train_edges.T:
        existing.add((int(u), int(v)))
        existing.add((int(v), int(u)))
    rng = np.random.default_rng(seed)
    neg = []
    while len(neg) < num_val_test:
        u, v = rng.integers(0, num_nodes, 2)
        if u != v and (int(u), int(v)) not in existing:
            neg.append((int(u), int(v)))
    neg_edges = np.array(neg, np.int64).T

    return {
        "train_pos": train_edges.astype(np.int64),
        "val_pos": val_test_edges[:, :num_val].astype(np.int64),
        "val_neg": neg_edges[:, :num_val],
        "test_pos": val_test_edges[:, num_val:].astype(np.int64),
        "test_neg": neg_edges[:, num_val:],
    }


def process_planetoid_dataset(name: str, raw_dir: Path, synthetic_scale: float = 1.0,
                              synthetic_seed: int = 0) -> Dict[str, GraphStore]:
    try:
        d = parse_planetoid(raw_dir, name)
        source = "raw"
        # Reference loads Planetoid with transform=NormalizeFeatures()
        # (src/data/data_setup.py:154): rows divided by their sum, clamped to
        # a minimum of 1. Synthetic stand-ins are generated pre-normalized.
        row_sum = d["x"].sum(axis=1, keepdims=True)
        d["x"] = (d["x"] / np.maximum(row_sum, 1.0)).astype(np.float32)
    except FileNotFoundError:
        d = synthetic.generate_planetoid(name, seed=synthetic_seed,
                                         scale=synthetic_scale)
        source = "synthetic"

    n = d["x"].shape[0]
    e = d["edge_index"].shape[1]
    n_off = np.array([0, n], np.int64)
    e_off = np.array([0, e], np.int64)

    nc_splits = {"train": np.where(d["train_mask"])[0].astype(np.int64),
                 "val": np.where(d["val_mask"])[0].astype(np.int64),
                 "test": np.where(d["test_mask"])[0].astype(np.int64)}
    meta = {"source": source,
            "scale": str(synthetic_scale if source == "synthetic" else 1.0)}
    nc_store = GraphStore(name=f"{name}_NC", node_features=d["x"],
                          edge_index=d["edge_index"], node_offsets=n_off,
                          edge_offsets=e_off, y=d["y"], splits=nc_splits,
                          node_y=d["y"], meta=meta)

    lp_splits = _create_link_prediction_splits(np.asarray(d["edge_index"], np.int64), n)
    lp_store = GraphStore(name=f"{name}_LP", node_features=d["x"],
                          edge_index=d["edge_index"], node_offsets=n_off,
                          edge_offsets=e_off, y=d["y"], splits=lp_splits,
                          node_y=d["y"], meta=meta)

    print(f"  {name}: {n} nodes, {e} directed edges ({source})")
    return {f"{name}_NC": nc_store, f"{name}_LP": lp_store}


def main(processed_dir: Optional[Path] = None, raw_dir: Optional[Path] = None,
         synthetic_scale: float = 1.0, synthetic_seed: int = 0,
         synthetic_homophily: float = 0.0, only=None) -> None:
    """``only`` restricts processing to the named datasets (TU names or
    Planetoid names) — e.g. a Cora-only store at a large synthetic scale for
    the 16k-node CSR cell, without paying graph-property computation for
    thousands of scaled TU graphs."""
    processed_dir = Path(processed_dir or config.PROCESSED_DIR)
    raw_dir = Path(raw_dir or config.RAW_DIR)
    processed_dir.mkdir(parents=True, exist_ok=True)

    print("Processing TU datasets...")
    for name in config.TUDATASETS:
        if only is not None and name not in only:
            continue
        store = process_tu_dataset(name, raw_dir, synthetic_scale,
                                   synthetic_seed, synthetic_homophily)
        store.save(processed_dir / f"{name}.npz")

    print("Processing Planetoid datasets...")
    for name in config.PLANETOID_DATASETS:
        if only is not None and name not in only:
            continue
        stores = process_planetoid_dataset(name, raw_dir, synthetic_scale,
                                           synthetic_seed)
        for key, store in stores.items():
            store.save(processed_dir / f"{key}.npz")
    print(f"Done -> {processed_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--processed_dir", type=str, default=None)
    p.add_argument("--raw_dir", type=str, default=None)
    p.add_argument("--synthetic_scale", type=float, default=1.0)
    p.add_argument("--synthetic_seed", type=int, default=0)
    p.add_argument("--synthetic_homophily", type=float, default=0.0,
                   help="smooth synthetic TU node features over edges so they "
                        "are neighbor-predictable (NFM probe calibration)")
    p.add_argument("--only", type=str, nargs="+", default=None,
                   help="process only these datasets (TU/Planetoid names)")
    a = p.parse_args()
    main(a.processed_dir, a.raw_dir, a.synthetic_scale, a.synthetic_seed,
         a.synthetic_homophily, a.only)
