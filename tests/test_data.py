"""Data-layer tests: batch building (incl. native parity), loaders, setup."""

import pathlib
import tempfile

import numpy as np
import pytest

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data import batch as batch_mod
from gnn_pretraining_tpu.data.batch import GraphStore, _build_batch_numpy, build_batch
from gnn_pretraining_tpu.data.loaders import (
    BalancedMultiDomainSampler,
    create_finetune_arrays,
    create_pretrain_val_loader,
)
from gnn_pretraining_tpu.data.synthetic import generate_tu_dataset


@pytest.fixture(scope="module")
def store():
    x, ei, noff, eoff, y = generate_tu_dataset("MUTAG", seed=1, scale=0.3)
    props = np.random.default_rng(0).normal(
        size=(len(noff) - 1, 12)).astype(np.float32)
    return GraphStore(name="MUTAG", node_features=x, edge_index=ei,
                      node_offsets=noff, edge_offsets=eoff, y=y,
                      splits={"train": np.arange(len(noff) - 1)},
                      graph_properties=props)


class TestBuildBatch:
    def test_native_matches_numpy(self, store):
        if batch_mod._native_batcher is None:
            pytest.skip("native batcher not built")
        idx = [3, 0, 7, 3]  # repeats allowed (sampling with replacement)
        a = build_batch(store, idx, 256, 512, 8, with_properties=True)
        b = _build_batch_numpy(store, idx, 256, 512, 8, with_properties=True)
        for field in a.__dataclass_fields__:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
                err_msg=field)

    def test_masks_and_segments(self, store):
        idx = [0, 1]
        b = build_batch(store, idx, 128, 256, 4)
        nn = store.graph_num_nodes(0) + store.graph_num_nodes(1)
        ne = store.graph_num_edges(0) + store.graph_num_edges(1)
        assert int(np.asarray(b.node_mask).sum()) == nn
        assert int(np.asarray(b.edge_mask).sum()) == ne
        assert int(np.asarray(b.graph_mask).sum()) == 2
        # edges stay within their graph's node range
        s = np.asarray(b.senders)[np.asarray(b.edge_mask) > 0]
        g0n = store.graph_num_nodes(0)
        eg = np.asarray(b.edge_graph)[np.asarray(b.edge_mask) > 0]
        assert (s[eg == 0] < g0n).all()
        assert (s[eg == 1] >= g0n).all()

    def test_overflow_raises(self, store):
        with pytest.raises(ValueError):
            build_batch(store, list(range(store.num_graphs)), 8, 8, 64)


class TestSampler:
    def test_balanced_sampler_step_counts(self, store):
        rng = np.random.default_rng(0)
        sampler = BalancedMultiDomainSampler({"MUTAG": store, "OTHER": store},
                                             rng, batch_size=32)
        assert sampler.samples_per_domain == 16
        step = sampler.sample_step()
        assert set(step.keys()) == {"MUTAG", "OTHER"}
        assert int(np.asarray(step["MUTAG"].graph_mask).sum()) == 16

    def test_reproducible_given_seed(self, store):
        s1 = BalancedMultiDomainSampler({"M": store},
                                        np.random.default_rng(7)).sample_step()
        s2 = BalancedMultiDomainSampler({"M": store},
                                        np.random.default_rng(7)).sample_step()
        np.testing.assert_array_equal(np.asarray(s1["M"].x),
                                      np.asarray(s2["M"].x))


class TestSetupAndLoaders:
    @pytest.fixture(scope="class")
    def processed(self):
        from gnn_pretraining_tpu.data import setup as data_setup

        tmp = pathlib.Path(tempfile.mkdtemp())
        data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                        synthetic_scale=0.06)
        return tmp

    def test_all_domains_present(self, processed):
        for d in list(config.TUDATASETS) + ["Cora_NC", "Cora_LP",
                                            "CiteSeer_NC", "CiteSeer_LP"]:
            assert (processed / f"{d}.npz").exists(), d

    def test_val_loader_shapes_consistent(self, processed):
        batches = create_pretrain_val_loader("PROTEINS", processed_dir=processed)
        shapes = {b.x.shape for b in batches}
        assert len(shapes) == 1  # one compile per loader

    def test_lp_splits_disjoint_and_labeled(self, processed):
        data = create_finetune_arrays("Cora_LP", "val", 64,
                                      processed_dir=processed)
        labels = np.concatenate(data.labels)
        masks = np.concatenate(data.edge_mask)
        # positives then negatives (unshuffled, reference
        # finetune_data_loaders.py:37-43) — first batches all-positive
        assert labels[masks > 0][0] == 1.0
        assert labels[masks > 0][-1] == 0.0

    def test_feature_scaling_clipped(self, processed):
        # Scaling applies only to continuous *downstream* sets — in practice
        # just ENZYMES (reference data_setup.py:90 sits inside the downstream
        # branch; PROTEINS is pretrain-only and stays unscaled).
        store = GraphStore.load(processed / "ENZYMES.npz")
        assert np.asarray(store.node_features).max() <= config.MAX_SCALE + 1e-6
        assert np.asarray(store.node_features).min() >= config.MIN_SCALE - 1e-6
