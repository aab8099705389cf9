"""Unit tests for the compute kernels (SURVEY.md §4a: every kernel fwd+bwd)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu.ops import (
    batched_negative_sampling,
    build_dense_adjacency,
    cosine_similarity_matrix,
    gin_aggregate_coo,
    gin_aggregate_dense,
    masked_randperm_select,
    nt_xent_loss,
    segment_max,
    segment_mean,
    segment_sum,
    spmm_pallas,
)


def random_graph(rng, n_valid, n_pad, e_valid, e_pad):
    senders = rng.integers(0, n_valid, e_pad).astype(np.int32)
    receivers = rng.integers(0, n_valid, e_pad).astype(np.int32)
    edge_mask = (np.arange(e_pad) < e_valid)
    node_mask = (np.arange(n_pad) < n_valid)
    return senders, receivers, edge_mask.astype(np.float32), node_mask


class TestAggregation:
    def test_coo_matches_dense(self):
        rng = np.random.default_rng(0)
        n, e = 50, 200
        senders, receivers, edge_mask, _ = random_graph(rng, n, 64, e, 256)
        h = rng.normal(size=(64, 16)).astype(np.float32)
        eps = jnp.float32(0.3)

        adj = build_dense_adjacency(jnp.array(senders), jnp.array(receivers),
                                    jnp.array(edge_mask), 64)
        out_dense = gin_aggregate_dense(jnp.array(h), adj, eps)
        out_coo = gin_aggregate_coo(jnp.array(h), jnp.array(senders),
                                    jnp.array(receivers), jnp.array(edge_mask), eps)
        np.testing.assert_allclose(out_dense, out_coo, rtol=1e-5, atol=1e-5)

    def test_coo_matches_manual_scatter(self):
        rng = np.random.default_rng(1)
        n, e = 30, 90
        senders, receivers, edge_mask, _ = random_graph(rng, n, 32, e, 128)
        h = rng.normal(size=(32, 8)).astype(np.float32)
        eps = 0.1

        expected = (1.0 + eps) * h.copy()
        for s, r, m in zip(senders, receivers, edge_mask):
            if m:
                expected[r] += h[s]
        out = gin_aggregate_coo(jnp.array(h), jnp.array(senders),
                                jnp.array(receivers), jnp.array(edge_mask),
                                jnp.float32(eps))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_pallas_matches_dense_fwd(self):
        rng = np.random.default_rng(2)
        n_pad = 136  # deliberately not a tile multiple
        adj = (rng.random((n_pad, n_pad)) < 0.05).astype(np.float32)
        h = rng.normal(size=(n_pad, 40)).astype(np.float32)
        eps = jnp.float32(-0.2)

        out_ref = gin_aggregate_dense(jnp.array(h), jnp.array(adj), eps)
        out_pl = spmm_pallas(jnp.array(adj), jnp.array(h), eps, "highest")
        np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-5)

    def test_pallas_precision_modes(self):
        rng = np.random.default_rng(8)
        n = 144
        adj = (rng.random((n, n)) < 0.05).astype(np.float32)
        h = rng.normal(size=(n, 64)).astype(np.float32)
        eps = jnp.float32(0.1)
        ref = gin_aggregate_dense(jnp.array(h), jnp.array(adj), eps)
        scale = float(jnp.max(jnp.abs(ref)))
        # split: two bf16 passes over hi/lo — near-f32
        out = spmm_pallas(jnp.array(adj), jnp.array(h), eps, "split")
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 1e-3
        # bf16: single pass — throughput mode
        out = spmm_pallas(jnp.array(adj), jnp.array(h), eps, "bf16")
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 5e-2
        # bf16-stored adjacency is exact for split (entries are small ints)
        out = spmm_pallas(jnp.array(adj, jnp.bfloat16), jnp.array(h), eps,
                          "split")
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 1e-3

    def test_pallas_custom_vjp_matches_autodiff(self):
        rng = np.random.default_rng(3)
        n = 72
        adj = (rng.random((n, n)) < 0.1).astype(np.float32)
        h = rng.normal(size=(n, 24)).astype(np.float32)
        eps0 = jnp.float32(0.05)

        def loss_pl(h_, e_):
            return jnp.sum(spmm_pallas(jnp.array(adj), h_, e_, "highest") ** 2)

        def loss_ref(h_, e_):
            return jnp.sum(gin_aggregate_dense(h_, jnp.array(adj), e_) ** 2)

        gh_pl, ge_pl = jax.grad(loss_pl, argnums=(0, 1))(jnp.array(h), eps0)
        gh_ref, ge_ref = jax.grad(loss_ref, argnums=(0, 1))(jnp.array(h), eps0)
        np.testing.assert_allclose(gh_pl, gh_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ge_pl, ge_ref, rtol=1e-4, atol=1e-4)

    def test_pallas_split_mode_grads_close(self):
        rng = np.random.default_rng(9)
        n = 80
        adj = (rng.random((n, n)) < 0.1).astype(np.float32)
        h = rng.normal(size=(n, 32)).astype(np.float32)
        eps0 = jnp.float32(0.0)

        gh_split = jax.grad(lambda x: jnp.sum(
            spmm_pallas(jnp.array(adj), x, eps0, "split") ** 2))(jnp.array(h))
        gh_ref = jax.grad(lambda x: jnp.sum(
            gin_aggregate_dense(x, jnp.array(adj), eps0) ** 2))(jnp.array(h))
        scale = float(jnp.max(jnp.abs(gh_ref))) + 1e-9
        assert float(jnp.max(jnp.abs(gh_split - gh_ref))) / scale < 2e-3


class TestSegment:
    def test_masked_mean_max(self):
        data = jnp.array([[1.0], [2.0], [3.0], [100.0]])
        seg = jnp.array([0, 0, 1, 1])
        mask = jnp.array([True, True, True, False])
        np.testing.assert_allclose(segment_mean(data, seg, 2, mask), [[1.5], [3.0]])
        np.testing.assert_allclose(segment_max(data, seg, 2, mask), [[2.0], [3.0]])
        np.testing.assert_allclose(segment_sum(data, seg, 2, mask), [[3.0], [3.0]])

    def test_empty_segment(self):
        data = jnp.ones((4, 2))
        seg = jnp.array([0, 0, 0, 0])
        mask = jnp.array([True, True, True, True])
        out = segment_max(data, seg, 3, mask)
        np.testing.assert_allclose(out[1], 0.0)
        np.testing.assert_allclose(out[2], 0.0)


class TestNTXent:
    def test_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(4)
        n_valid, n_pad = 6, 10
        z1 = rng.normal(size=(n_pad, 5)).astype(np.float32)
        z2 = rng.normal(size=(n_pad, 5)).astype(np.float32)
        valid = np.arange(n_pad) < n_valid
        temp = 0.37

        # Reference computation (src/pretrain/tasks.py:192-213) on valid rows.
        t1 = F.normalize(torch.tensor(z1[:n_valid]), dim=1)
        t2 = F.normalize(torch.tensor(z2[:n_valid]), dim=1)
        z = torch.cat([t1, t2], 0)
        sim = (z @ z.T) / temp
        sim = sim.masked_fill(torch.eye(2 * n_valid, dtype=torch.bool), float("-inf"))
        pos = torch.cat([torch.arange(n_valid, 2 * n_valid), torch.arange(0, n_valid)])
        expected = F.cross_entropy(sim, pos, reduction="sum").item()

        loss_sum, n_rows = nt_xent_loss(jnp.array(z1), jnp.array(z2),
                                        jnp.float32(temp), jnp.array(valid))
        assert float(n_rows) == 2 * n_valid
        np.testing.assert_allclose(float(loss_sum), expected, rtol=1e-4)

    def test_gradients_finite(self):
        rng = np.random.default_rng(5)
        z1 = rng.normal(size=(8, 4)).astype(np.float32)
        z2 = rng.normal(size=(8, 4)).astype(np.float32)
        valid = jnp.array([True] * 5 + [False] * 3)

        def f(a, b):
            s, n = nt_xent_loss(a, b, jnp.float32(0.5), valid)
            return s / jnp.maximum(n, 1.0)

        g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.array(z1), jnp.array(z2))
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()
        # Padding rows receive no gradient.
        np.testing.assert_allclose(np.asarray(g1)[5:], 0.0)


class TestRandpermSelect:
    def test_counts_and_validity(self):
        key = jax.random.PRNGKey(0)
        group_ids = jnp.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 2])
        row_mask = jnp.array([1, 1, 1, 1, 1, 1, 0, 1, 1, 1], bool)
        num_select = jnp.array([2, 1, 3])
        sel = masked_randperm_select(key, group_ids, row_mask, num_select)
        sel = np.asarray(sel)
        assert sel[:4].sum() == 2
        assert sel[4:7].sum() == 1
        assert not sel[6]  # invalid row never selected
        assert sel[7:].sum() == 3

    def test_uniformity(self):
        group_ids = jnp.zeros(6, jnp.int32)
        row_mask = jnp.ones(6, bool)
        num_select = jnp.array([2])
        counts = np.zeros(6)
        for i in range(400):
            sel = masked_randperm_select(jax.random.PRNGKey(i), group_ids,
                                         row_mask, num_select)
            counts += np.asarray(sel)
        freq = counts / 400
        np.testing.assert_allclose(freq, 2 / 6, atol=0.07)


class TestNegativeSampling:
    def test_negatives_avoid_edges_and_stay_in_graph(self):
        rng = np.random.default_rng(6)
        # Two graphs: nodes [0,8) and [8,14).
        node_start = jnp.array([0, 8])
        n_node = jnp.array([8, 6])
        senders = np.array([0, 1, 2, 3, 8, 9, 10, 0, 0, 0], np.int32)
        receivers = np.array([1, 2, 3, 0, 9, 10, 8, 0, 0, 0], np.int32)
        edge_graph = np.array([0, 0, 0, 0, 1, 1, 1, 0, 0, 0], np.int32)
        edge_mask = np.array([1, 1, 1, 1, 1, 1, 1, 0, 0, 0], np.float32)

        adj = build_dense_adjacency(jnp.array(senders), jnp.array(receivers),
                                    jnp.array(edge_mask), 16)
        und = ((adj + adj.T) > 0).astype(jnp.float32)

        u, v = batched_negative_sampling(jax.random.PRNGKey(0), und,
                                         jnp.array(edge_graph),
                                         jnp.array(edge_mask), node_start, n_node)
        u, v = np.asarray(u), np.asarray(v)
        und_np = np.asarray(und)
        for i in range(7):
            g = edge_graph[i]
            lo, hi = (0, 8) if g == 0 else (8, 14)
            assert lo <= u[i] < hi and lo <= v[i] < hi
            assert u[i] != v[i]
            assert und_np[u[i], v[i]] == 0

    def test_distribution_covers_non_edges(self):
        node_start = jnp.array([0])
        n_node = jnp.array([5])
        senders = jnp.array([0, 1], jnp.int32)
        receivers = jnp.array([1, 0], jnp.int32)
        edge_graph = jnp.zeros(2, jnp.int32)
        edge_mask = jnp.ones(2, jnp.float32)
        adj = build_dense_adjacency(senders, receivers, edge_mask, 5)
        und = ((adj + adj.T) > 0).astype(jnp.float32)

        seen = set()
        for i in range(200):
            u, v = batched_negative_sampling(jax.random.PRNGKey(i), und,
                                             edge_graph, edge_mask, node_start, n_node)
            for a, b in zip(np.asarray(u), np.asarray(v)):
                seen.add((int(a), int(b)))
        # 5*4 ordered pairs minus the 2 existing directed edges = 18 non-edges.
        assert len(seen) == 18


class TestCosine:
    def test_matches_numpy(self):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(6, 4)).astype(np.float32)
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        np.testing.assert_allclose(cosine_similarity_matrix(jnp.array(a)),
                                   an @ an.T, rtol=1e-5, atol=1e-5)


class TestExactTopK:
    def test_matches_flat_top_k(self):
        from gnn_pretraining_tpu.ops.topk import exact_top_k

        rng = np.random.default_rng(11)
        # Long enough to take the blocked path with an uneven tail.
        v = jnp.asarray(rng.normal(size=(300_001,)).astype(np.float32))
        ref_v, ref_i = jax.lax.top_k(v, 64)
        got_v, got_i = exact_top_k(v, 64, num_blocks=128)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v))
        assert set(np.asarray(got_i).tolist()) == set(np.asarray(ref_i).tolist())

    def test_small_fallback(self):
        from gnn_pretraining_tpu.ops.topk import exact_top_k

        v = jnp.asarray(np.arange(100, dtype=np.float32))
        got_v, got_i = exact_top_k(v, 5)
        np.testing.assert_array_equal(np.asarray(got_v), [99, 98, 97, 96, 95])
        np.testing.assert_array_equal(np.asarray(got_i), [99, 98, 97, 96, 95])

    def test_neg_inf_masked(self):
        from gnn_pretraining_tpu.ops.topk import exact_top_k

        rng = np.random.default_rng(12)
        v = rng.normal(size=(70_000,)).astype(np.float32)
        v[::2] = -np.inf  # half forbidden, like the mining mask
        ref_v, _ = jax.lax.top_k(jnp.asarray(v), 32)
        got_v, got_i = exact_top_k(jnp.asarray(v), 32, num_blocks=64)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v))
        assert np.all(np.asarray(got_i) % 2 == 1)
