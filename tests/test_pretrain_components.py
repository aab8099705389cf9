"""Semantic tests for schedulers, balancer, PCGrad, and augmentations
against independent numpy implementations of the reference formulas."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.batch import GraphBatch
from gnn_pretraining_tpu.pretrain.augmentations import augment_view, create_two_views
from gnn_pretraining_tpu.pretrain.balancer import balance_losses
from gnn_pretraining_tpu.pretrain.pcgrad import apply_pcgrad, task_participates
from gnn_pretraining_tpu.pretrain.schedulers import grl_lambda_at, temperature_at


class TestSchedulers:
    def test_temperature(self):
        # τ = 0.5·(0.4)^progress (reference schedulers.py:15-18)
        total = 1000
        for step in (0, 100, 500, 1000, 1500):
            progress = min(1.0, step / total)
            expected = 0.5 * (0.2 / 0.5) ** progress
            got = float(temperature_at(jnp.int32(step), total))
            assert abs(got - expected) < 1e-6, (step, got, expected)

    def test_grl_lambda(self):
        total = 1000
        start = 0.4 * total
        for step in (0, 399, 400, 700, 1000):
            if step < start:
                expected = 0.0
            else:
                p = (step - start) / (total - start)
                expected = (2.0 / (1.0 + math.exp(-10.0 * p)) - 1.0) * 0.01
            got = float(grl_lambda_at(jnp.int32(step), total))
            assert abs(got - expected) < 1e-7, (step, got, expected)


class TestBalancer:
    def test_single_task_passthrough(self):
        total, w, sc = balance_losses({"a": jnp.float32(3.5)}, jnp.int32(5))
        assert float(total) == 3.5
        assert int(sc) == 5  # not incremented

    def test_warmup_equal_weights(self):
        losses = {"a": jnp.float32(2.0), "b": jnp.float32(6.0)}
        total, w, sc = balance_losses(losses, jnp.int32(0))
        assert int(sc) == 1
        np.testing.assert_allclose(float(total), 0.5 * 2 + 0.5 * 6, rtol=1e-6)

    def test_adaptive_inverse_magnitude(self):
        losses = {"a": jnp.float32(2.0), "b": jnp.float32(6.0)}
        total, w, sc = balance_losses(losses, jnp.int32(200))
        inv = np.array([1 / (2 + 1e-8), 1 / (6 + 1e-8)])
        wn = inv / inv.sum()
        np.testing.assert_allclose([float(w["a"]), float(w["b"])], wn, rtol=1e-5)
        np.testing.assert_allclose(float(total), (wn * [2, 6]).sum(), rtol=1e-5)

    def test_min_total_clamp(self):
        losses = {"a": jnp.float32(0.0), "b": jnp.float32(0.0)}
        total, _, _ = balance_losses(losses, jnp.int32(0))
        np.testing.assert_allclose(float(total), config.BALANCER_MIN_TOTAL_LOSS,
                                   rtol=1e-6)


class TestPCGrad:
    def _grads(self, vals):
        return {name: {"gnn_backbone": {"w": jnp.array(v, jnp.float32)}}
                for name, v in vals.items()}

    def test_no_conflict_means_mean(self):
        g = self._grads({"t1": [1.0, 0.0], "t2": [0.0, 1.0]})
        params = {"gnn_backbone": {"w": jnp.zeros(2)}}
        combined, m = apply_pcgrad(g, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(combined["gnn_backbone"]["w"]),
                                   [0.5, 0.5], rtol=1e-6)
        assert float(m["gradient_surgery/total_conflicts"]) == 0

    def test_opposite_grads_project_to_zero(self):
        g = self._grads({"t1": [1.0, 0.0], "t2": [-1.0, 0.0]})
        params = {"gnn_backbone": {"w": jnp.zeros(2)}}
        combined, m = apply_pcgrad(g, jax.random.PRNGKey(0))
        # Later task projects onto earlier's normal plane -> one becomes 0;
        # mean = (g_first + 0)/2 = ±0.5 depending on the shuffle.
        assert abs(abs(float(np.asarray(combined["gnn_backbone"]["w"])[0])) - 0.5) < 1e-6
        assert float(m["gradient_surgery/total_conflicts"]) == 1

    def test_projection_formula(self):
        # deterministic order check against the reference formula by trying
        # both orders (shuffle picks one).
        g1 = np.array([1.0, 1.0], np.float32)
        g2 = np.array([-1.0, 0.5], np.float32)
        g = self._grads({"t1": g1, "t2": g2})
        params = {"gnn_backbone": {"w": jnp.zeros(2)}}
        combined, m = apply_pcgrad(g, jax.random.PRNGKey(3))
        got = np.asarray(combined["gnn_backbone"]["w"])

        def proj(a, b):  # project a off b if conflicting
            dot = a @ b
            if dot < 0:
                return a - dot / (b @ b) * b
            return a

        exp_orders = [(proj(g2, g1) + g1) / 2, (proj(g1, g2) + g2) / 2]
        assert any(np.allclose(got, e, atol=1e-6) for e in exp_orders), (got, exp_orders)

    def test_participation_mean(self):
        # Head params get grads only from their own task: mean over 1 task.
        g = {
            "t1": {"gnn_backbone": {"w": jnp.array([2.0])},
                   "heads_t1": {"w": jnp.array([4.0])},
                   "heads_t2": {"w": jnp.array([0.0])}},
            "t2": {"gnn_backbone": {"w": jnp.array([4.0])},
                   "heads_t1": {"w": jnp.array([0.0])},
                   "heads_t2": {"w": jnp.array([6.0])}},
        }
        params = {"gnn_backbone": {"w": jnp.zeros(1)},
                  "heads_t1": {"w": jnp.zeros(1)},
                  "heads_t2": {"w": jnp.zeros(1)}}
        combined, _ = apply_pcgrad(g, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(combined["gnn_backbone"]["w"][0]), 3.0)
        np.testing.assert_allclose(float(combined["heads_t1"]["w"][0]), 4.0)
        np.testing.assert_allclose(float(combined["heads_t2"]["w"][0]), 6.0)

    def test_participation_rules(self):
        assert task_participates("heads_node_feat_mask_MUTAG", "node_feat_mask")
        assert not task_participates("heads_node_feat_mask_MUTAG", "link_pred")
        assert task_participates("mask_token", "node_feat_mask")
        assert not task_participates("mask_token", "link_pred")
        assert not task_participates("input_encoders_MUTAG", "node_feat_mask")
        assert task_participates("input_encoders_MUTAG", "link_pred")
        assert task_participates("gnn_backbone", "node_feat_mask")


def _toy_batch(rng, g=4, npg=10, epg=20):
    n, e = g * npg, g * epg
    senders = np.concatenate([rng.integers(0, npg, epg) + i * npg
                              for i in range(g)]).astype(np.int32)
    receivers = np.concatenate([rng.integers(0, npg, epg) + i * npg
                                for i in range(g)]).astype(np.int32)
    return GraphBatch(
        x=rng.normal(size=(n, 8)).astype(np.float32),
        senders=senders, receivers=receivers,
        edge_mask=np.ones(e, np.float32),
        edge_graph=np.repeat(np.arange(g), epg).astype(np.int32),
        node_mask=np.ones(n, np.float32),
        node_graph=np.repeat(np.arange(g), npg).astype(np.int32),
        graph_mask=np.ones(g, np.float32),
        node_start=(np.arange(g) * npg).astype(np.int32),
        n_node=np.full(g, npg, np.int32),
        n_edge=np.full(g, epg, np.int32),
        y=np.zeros(g, np.int32),
        graph_properties=np.zeros((g, 12), np.float32))


class TestAugmentations:
    def test_node_drop_counts(self):
        rng = np.random.default_rng(0)
        batch = _toy_batch(rng)
        v = augment_view(jax.random.PRNGKey(0), batch)
        keep = np.asarray(v.node_keep).reshape(4, 10)
        # 10 nodes -> drop max(1, int(2.0)) = 2, keep 8
        np.testing.assert_array_equal(keep.sum(1), [8, 8, 8, 8])

    def test_edges_incident_to_dropped_nodes_removed(self):
        rng = np.random.default_rng(1)
        batch = _toy_batch(rng)
        v = augment_view(jax.random.PRNGKey(1), batch)
        keep = np.asarray(v.node_keep) > 0
        ekeep = np.asarray(v.edge_keep) > 0
        s, r = np.asarray(batch.senders), np.asarray(batch.receivers)
        assert not np.any(ekeep & (~keep[s] | ~keep[r]))

    def test_attr_mask_zeroes_columns(self):
        rng = np.random.default_rng(2)
        batch = _toy_batch(rng)
        hit = False
        for i in range(40):
            v = augment_view(jax.random.PRNGKey(i), batch)
            x = np.asarray(v.x).reshape(4, 10, 8)
            for gi in range(4):
                zero_cols = np.all(x[gi] == 0.0, axis=0)
                if zero_cols.sum() >= 1:
                    hit = True
                    # masked count = max(1, int(8*0.2)) = 1
                    assert zero_cols.sum() == 1
        assert hit  # gate fires ~20% per graph; 160 draws make a miss astronomically unlikely

    def test_common_nodes(self):
        rng = np.random.default_rng(3)
        batch = _toy_batch(rng)
        v1, v2, common = create_two_views(jax.random.PRNGKey(5), batch)
        np.testing.assert_array_equal(
            np.asarray(common),
            np.asarray(v1.node_keep) * np.asarray(v2.node_keep))
        # with 8/10 kept per view, expect ≥ 6 commons per graph typically >0
        assert np.asarray(common).sum() > 0

    def test_min_sizes_respected(self):
        rng = np.random.default_rng(4)
        batch = _toy_batch(rng, g=2, npg=2, epg=2)  # graphs below min sizes
        v = augment_view(jax.random.PRNGKey(0), batch)
        np.testing.assert_array_equal(np.asarray(v.node_keep),
                                      np.asarray(batch.node_mask))
