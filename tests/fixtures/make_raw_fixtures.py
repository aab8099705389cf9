"""Generate tiny golden fixtures in the authentic raw dataset formats.

Run once (`python tests/fixtures/make_raw_fixtures.py`) to (re)create the
checked-in fixture files; tests/test_parsers.py parses them byte-for-byte
through the production readers (`data/parsers.py`) and the preprocessing
pipeline (`data/setup.py`), proving the real-data path is live code even in
this zero-egress container.

Formats reproduced:
  * TU Dortmund (`tu_raw/ENZYMES_*.txt`): 1-based comma-separated global edge
    list, graph indicator, graph labels, node labels, node attributes —
    exactly the layout of the public ENZYMES download the reference feeds to
    TUDataset (/root/reference/src/data/data_setup.py:75-110). Includes
    deliberate self-loops, duplicate edges and non-contiguous label values to
    exercise the coalescing/normalization rules.
  * Planetoid (`planetoid_raw/ind.cora.*`): pickled scipy CSR matrices +
    numpy one-hots + adjacency dict + shuffled test.index WITH an index gap
    (an isolated zero-feature node, as in the real CiteSeer), the layout
    Planetoid reads (/root/reference/src/data/data_setup.py:152-165).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
import scipy.sparse as sp

HERE = Path(__file__).resolve().parent


def make_tu(out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    num_graphs = 30
    sizes = rng.integers(3, 6, num_graphs)  # 3-5 nodes per graph
    graph_labels = np.where(np.arange(num_graphs) % 2 == 0, 2, 5)  # non-contig

    indicator, edges, node_labels, node_attrs = [], [], [], []
    offset = 0
    for g in range(num_graphs):
        n = int(sizes[g])
        indicator += [g + 1] * n  # 1-based
        node_labels += list(rng.integers(0, 3, n) * 2)  # values {0,2,4}
        node_attrs += [rng.normal(size=2).round(4) for _ in range(n)]
        # ring + one chord, both directions (TU lists are directed pairs)
        for i in range(n):
            j = (i + 1) % n
            edges.append((offset + i + 1, offset + j + 1))
            edges.append((offset + j + 1, offset + i + 1))
        if n >= 4:
            edges.append((offset + 1, offset + 3))
            edges.append((offset + 3, offset + 1))
        if g == 0:  # deliberate self-loop: parser must drop it
            edges.append((offset + 1, offset + 1))
        if g == 1:  # deliberate duplicate edge: parser must coalesce it
            edges.append((offset + 1, offset + 2))
        offset += n

    with open(out / "ENZYMES_A.txt", "w") as f:
        for u, v in edges:
            f.write(f"{u}, {v}\n")
    with open(out / "ENZYMES_graph_indicator.txt", "w") as f:
        f.write("\n".join(str(i) for i in indicator) + "\n")
    with open(out / "ENZYMES_graph_labels.txt", "w") as f:
        f.write("\n".join(str(int(l)) for l in graph_labels) + "\n")
    with open(out / "ENZYMES_node_labels.txt", "w") as f:
        f.write("\n".join(str(int(l)) for l in node_labels) + "\n")
    with open(out / "ENZYMES_node_attributes.txt", "w") as f:
        for a in node_attrs:
            f.write(f"{a[0]:.4f}, {a[1]:.4f}\n")


def make_planetoid(out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)
    d, c = 4, 3
    # 15 allx nodes (0..14), 5 test nodes at shuffled ids {15,16,18,19,20};
    # node 17 is the CiteSeer-style gap (isolated, zero features).
    allx = sp.csr_matrix((rng.random((15, d)) > 0.5).astype(np.float32))
    tx = sp.csr_matrix((rng.random((5, d)) > 0.5).astype(np.float32))
    x = allx[:6]  # labeled-train block
    ally = np.eye(c, dtype=np.float32)[rng.integers(0, c, 15)]
    ty = np.eye(c, dtype=np.float32)[rng.integers(0, c, 5)]
    y = ally[:6]
    test_index = np.array([18, 15, 20, 16, 19])  # shuffled, with 17 missing

    graph = {}
    n = 21
    undirected = set()
    for _ in range(30):
        u, v = rng.integers(0, n, 2)
        if u == v or u == 17 or v == 17:
            continue
        undirected.add((min(int(u), int(v)), max(int(u), int(v))))
    for u, v in sorted(undirected):
        graph.setdefault(u, []).append(v)
        graph.setdefault(v, []).append(u)
    graph.setdefault(3, []).append(3)  # deliberate self-loop: must be dropped

    for name, obj in [("x", x), ("tx", tx), ("allx", allx),
                      ("y", y), ("ty", ty), ("ally", ally),
                      ("graph", graph)]:
        with open(out / f"ind.cora.{name}", "wb") as f:
            pickle.dump(obj, f, protocol=2)
    with open(out / "ind.cora.test.index", "w") as f:
        f.write("\n".join(str(i) for i in test_index) + "\n")


if __name__ == "__main__":
    make_tu(HERE / "tu_raw")
    make_planetoid(HERE / "planetoid_raw")
    print("fixtures written under", HERE)
