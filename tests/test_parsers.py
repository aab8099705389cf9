"""Raw-format parser tests: write synthetic raw files, parse, compare.

Validates the torch-geometric-free readers (data/parsers.py) against
round-trips of the on-disk formats, so the pipeline is ready the moment real
TUDataset/Planetoid raw files are dropped into data/raw.
"""

import pathlib
import pickle
import tempfile

import numpy as np
import pytest
import scipy.sparse as sp

from gnn_pretraining_tpu.data.parsers import parse_planetoid, parse_tu_dataset


def _write_tu_raw(d: pathlib.Path, name: str):
    """Two triangles with node labels + attributes, labels {-1, 1}."""
    d.mkdir(parents=True, exist_ok=True)
    # graph 1: nodes 1-3, graph 2: nodes 4-6 (1-based, undirected both dirs)
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),
             (4, 5), (5, 4), (5, 6), (6, 5), (4, 6), (6, 4),
             (1, 1)]  # self-loop: must be dropped
    (d / f"{name}_A.txt").write_text(
        "\n".join(f"{a}, {b}" for a, b in edges) + "\n")
    (d / f"{name}_graph_indicator.txt").write_text(
        "\n".join(["1"] * 3 + ["2"] * 3) + "\n")
    (d / f"{name}_graph_labels.txt").write_text("-1\n1\n")
    (d / f"{name}_node_labels.txt").write_text("\n".join("012021") + "\n")
    attrs = np.arange(12, dtype=float).reshape(6, 2)
    (d / f"{name}_node_attributes.txt").write_text(
        "\n".join(f"{a}, {b}" for a, b in attrs) + "\n")


class TestTUParser:
    def test_roundtrip(self):
        tmp = pathlib.Path(tempfile.mkdtemp())
        _write_tu_raw(tmp, "TOY")
        x, ei, noff, eoff, y = parse_tu_dataset(tmp, "TOY")

        assert x.shape == (6, 2 + 3)  # 2 attrs + 3 one-hot node labels
        np.testing.assert_array_equal(noff, [0, 3, 6])
        # 6 directed edges per graph; self-loop removed
        np.testing.assert_array_equal(eoff, [0, 6, 12])
        np.testing.assert_array_equal(y, [0, 1])  # {-1,1} -> {0,1}
        # attributes preserved, one-hot correct
        np.testing.assert_array_equal(x[:, :2], np.arange(12).reshape(6, 2))
        np.testing.assert_array_equal(x[0, 2:], [1, 0, 0])  # label '0'
        np.testing.assert_array_equal(x[1, 2:], [0, 1, 0])  # label '1'
        # edges are graph-local (0-based within each graph)
        assert ei[:, :6].max() < 3
        assert ei[:, 6:].max() < 3

    def test_missing_raises(self):
        with pytest.raises(FileNotFoundError):
            parse_tu_dataset(pathlib.Path(tempfile.mkdtemp()), "NOPE")


def _write_planetoid_raw(d: pathlib.Path, name: str):
    """Tiny 8-node citation graph in the ind.* pickled format."""
    d.mkdir(parents=True, exist_ok=True)
    n_train, n_test, n_all = 3, 2, 6  # allx covers 6, test idx 6..7
    dim, c = 5, 3
    rng = np.random.default_rng(0)
    lname = name.lower()

    def dump(obj, suffix):
        with open(d / f"ind.{lname}.{suffix}", "wb") as f:
            pickle.dump(obj, f)

    allx = sp.csr_matrix(rng.random((n_all, dim)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, dim)).astype(np.float32))
    x = allx[:n_train]
    ally = np.eye(c)[rng.integers(0, c, n_all)]
    ty = np.eye(c)[rng.integers(0, c, n_test)]
    yy = ally[:n_train]
    graph = {0: [1, 2], 1: [0], 2: [0, 3], 3: [2], 4: [5], 5: [4],
             6: [7], 7: [6]}
    dump(x, "x"); dump(tx, "tx"); dump(allx, "allx")
    dump(yy, "y"); dump(ty, "ty"); dump(ally, "ally")
    dump(graph, "graph")
    (d / f"ind.{lname}.test.index").write_text("6\n7\n")
    return allx, tx, ally, ty


class TestPlanetoidParser:
    def test_roundtrip(self):
        tmp = pathlib.Path(tempfile.mkdtemp())
        allx, tx, ally, ty = _write_planetoid_raw(tmp, "Toy")
        out = parse_planetoid(tmp, "Toy")

        assert out["x"].shape == (8, 5)
        np.testing.assert_allclose(out["x"][:6], np.asarray(allx.todense()),
                                   rtol=1e-6)
        np.testing.assert_allclose(out["x"][6:], np.asarray(tx.todense()),
                                   rtol=1e-6)
        np.testing.assert_array_equal(out["y"][:6], ally.argmax(1))
        np.testing.assert_array_equal(out["y"][6:], ty.argmax(1))
        # standard masks: first len(y) train, next 500-capped val, test idx
        assert out["train_mask"][:3].all() and not out["train_mask"][3:].any()
        assert out["test_mask"][6:].all() and not out["test_mask"][:6].any()
        # undirected coalesced edges, no self-loops
        ei = out["edge_index"]
        assert ei.shape[1] == 10  # 5 undirected pairs x 2 directions
        assert (ei[0] != ei[1]).all()


# ---------------------------------------------------------------------------
# Checked-in golden fixtures (authentic raw byte formats)
# ---------------------------------------------------------------------------
# tests/fixtures/{tu_raw,planetoid_raw} hold tiny datasets in the exact
# public TU Dortmund / Planetoid on-disk layouts (see
# tests/fixtures/make_raw_fixtures.py). These tests run the production
# raw path — parse_* AND the full preprocessing in data/setup.py — against
# precomputed goldens, proving the real-data branch is live code in this
# zero-egress container (reference: src/data/data_setup.py:75-165).

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


class TestGoldenTU:
    def test_parse_golden(self):
        x, ei, noff, eoff, y = parse_tu_dataset(FIXTURES / "tu_raw", "ENZYMES")
        assert x.shape == (122, 5)  # 2 attrs + 3 one-hot node labels
        assert noff[-1] == 122 and len(noff) == 31
        np.testing.assert_array_equal(np.unique(y), [0, 1])  # {2,5} -> {0,1}
        # graph 0 (5-ring + chord 0-2): the deliberate self-loop is dropped
        np.testing.assert_array_equal(
            ei[:, eoff[0]:eoff[1]],
            [[0, 0, 0, 1, 1, 2, 2, 2, 3, 3, 4, 4],
             [1, 2, 4, 0, 2, 0, 1, 3, 2, 4, 0, 3]])
        # graph 1 (4-ring + chord): the deliberate duplicate edge coalesces
        assert eoff[2] - eoff[1] == 10

    def test_process_golden_splits_and_properties(self):
        from gnn_pretraining_tpu.data.setup import process_tu_dataset

        store = process_tu_dataset("ENZYMES", FIXTURES / "tu_raw")
        assert store.meta["source"] == "raw"
        # stratified 80/10/10, RANDOM_SEED=42 (reference :84-110)
        np.testing.assert_array_equal(
            sorted(store.splits["val"].tolist()), [6, 15, 29])
        np.testing.assert_array_equal(
            sorted(store.splits["test"].tolist()), [5, 12, 24])
        assert len(store.splits["train"]) == 24
        # ENZYMES is continuous: StandardScaler on train rows, clip to ±3
        assert store.node_features.min() >= -3.0
        assert store.node_features.max() <= 3.0
        # graph properties standardized over the train split (ddof=0)
        props = store.graph_properties
        assert props.shape == (30, 12)
        np.testing.assert_allclose(props[store.splits["train"]].mean(0),
                                   0.0, atol=1e-5)
        np.testing.assert_allclose(
            props[0],
            [1.351691, 1.194792, -1.416671, 0.610796, 0.803358, 0.845154,
             -1.510438, -1.444856, 0.0, 0.845154, -0.150188, 0.542266],
            atol=1e-4)


class TestGoldenPlanetoid:
    def test_parse_golden(self):
        d = parse_planetoid(FIXTURES / "planetoid_raw", "Cora")
        assert d["x"].shape == (21, 4)
        assert d["edge_index"].shape[1] == 54
        np.testing.assert_array_equal(np.where(d["train_mask"])[0],
                                      np.arange(6))
        # test.index is shuffled AND has a gap at 17 (CiteSeer-style)
        np.testing.assert_array_equal(np.where(d["test_mask"])[0],
                                      [15, 16, 18, 19, 20])
        # the gap node: isolated, all-zero features, excluded from test
        assert d["x"][17].sum() == 0.0
        assert (d["edge_index"] != 17).all()
        # the deliberate self-loop in the graph dict is dropped
        assert (d["edge_index"][0] != d["edge_index"][1]).all()

    def test_process_golden_lp_splits(self):
        """The 80/10/10 LP edge split must replay the torch.randperm(seed=42)
        stream bit-exactly (reference :126-149)."""
        from gnn_pretraining_tpu.data.setup import process_planetoid_dataset

        stores = process_planetoid_dataset("Cora", FIXTURES / "planetoid_raw")
        lp = stores["Cora_LP"].splits
        assert lp["train_pos"].shape == (2, 44)
        np.testing.assert_array_equal(
            lp["val_pos"], [[2, 10, 13, 18, 11], [3, 1, 3, 16, 19]])
        np.testing.assert_array_equal(
            lp["test_pos"], [[9, 1, 7, 12, 18], [13, 7, 18, 4, 13]])
        np.testing.assert_array_equal(
            lp["val_neg"], [[1, 9, 1, 4, 15], [16, 18, 14, 1, 16]])
        # negatives never collide with train positives (either direction)
        train = {(int(u), int(v)) for u, v in lp["train_pos"].T}
        for u, v in np.concatenate([lp["val_neg"], lp["test_neg"]], 1).T:
            assert (int(u), int(v)) not in train
            assert (int(v), int(u)) not in train
        # NC store keeps the public masks; features row-normalized
        nc = stores["Cora_NC"]
        rs = nc.node_features.sum(1)
        assert (rs <= 1.0 + 1e-5).all()


class TestGoldenEndToEnd:
    """data/setup.py::main end-to-end on the authentic-byte-layout fixtures
    (VERDICT r3 #6): the exact pipeline a user runs after dropping raw files
    into data/raw — PyG-nested layout, setup.main, serialized GraphStores —
    re-asserting the split/property/LP-negative goldens through the
    save/load roundtrip."""

    @pytest.fixture(scope="class")
    def stores(self):
        import shutil

        from gnn_pretraining_tpu.data import setup as data_setup
        from gnn_pretraining_tpu.data.batch import GraphStore

        tmp = pathlib.Path(tempfile.mkdtemp())
        raw = tmp / "raw"
        # the nested <root>/<name>/raw/ layout a real download produces
        tu = raw / "ENZYMES" / "raw"
        tu.mkdir(parents=True)
        for f in (FIXTURES / "tu_raw").iterdir():
            shutil.copy(f, tu / f.name)
        pl = raw / "Cora" / "raw"
        pl.mkdir(parents=True)
        for f in (FIXTURES / "planetoid_raw").iterdir():
            shutil.copy(f, pl / f.name)

        processed = tmp / "processed"
        data_setup.main(processed_dir=processed, raw_dir=raw,
                        only=["ENZYMES", "Cora"])
        return {p.stem: GraphStore.load(p)
                for p in sorted(processed.glob("*.npz"))}

    def test_sources_are_raw(self, stores):
        assert set(stores) == {"ENZYMES", "Cora_NC", "Cora_LP"}
        for s in stores.values():
            assert s.meta["source"] == "raw", s.name

    def test_tu_goldens_survive_roundtrip(self, stores):
        store = stores["ENZYMES"]
        np.testing.assert_array_equal(
            sorted(store.splits["val"].tolist()), [6, 15, 29])
        np.testing.assert_array_equal(
            sorted(store.splits["test"].tolist()), [5, 12, 24])
        assert store.node_features.min() >= -3.0
        assert store.node_features.max() <= 3.0
        np.testing.assert_allclose(
            store.graph_properties[0],
            [1.351691, 1.194792, -1.416671, 0.610796, 0.803358, 0.845154,
             -1.510438, -1.444856, 0.0, 0.845154, -0.150188, 0.542266],
            atol=1e-4)

    def test_lp_goldens_survive_roundtrip(self, stores):
        lp = stores["Cora_LP"].splits
        assert lp["train_pos"].shape == (2, 44)
        np.testing.assert_array_equal(
            lp["val_pos"], [[2, 10, 13, 18, 11], [3, 1, 3, 16, 19]])
        np.testing.assert_array_equal(
            lp["val_neg"], [[1, 9, 1, 4, 15], [16, 18, 14, 1, 16]])
