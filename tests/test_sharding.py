"""Multi-device SPMD tests on the 8-device virtual CPU mesh (SURVEY.md §4d).

Validates that the sharded paths compute exactly the single-device numbers:
edge-partitioned aggregation, gathered NT-Xent, SyncBN, psum'd task grads,
and that a full data-parallel multi-task train step executes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.batch import GraphBatch
from gnn_pretraining_tpu.models.pretrain_model import PretrainableGNN
from gnn_pretraining_tpu.ops.sddmm import nt_xent_loss
from gnn_pretraining_tpu.ops.spmm import gin_aggregate_coo
from gnn_pretraining_tpu.parallel.edge_partition import (
    edge_partitioned_aggregate,
    shard_edges,
)
from gnn_pretraining_tpu.parallel.mesh import make_mesh
from gnn_pretraining_tpu.pretrain.tasks import TaskContext, compute_task_loss

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(n_data=N_DEV, n_edge=1)


@pytest.fixture(scope="module")
def edge_mesh():
    return make_mesh(n_data=1, n_edge=N_DEV)


class TestEdgePartition:
    def test_matches_single_device(self, edge_mesh):
        rng = np.random.default_rng(0)
        n, e, f = 200, 1000, 32
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = rng.integers(0, n, e).astype(np.int32)
        edge_mask = (rng.random(e) < 0.9).astype(np.float32)
        h = rng.normal(size=(n, f)).astype(np.float32)
        eps = jnp.float32(0.25)

        ref = gin_aggregate_coo(jnp.array(h), jnp.array(senders),
                                jnp.array(receivers), jnp.array(edge_mask), eps)

        s, r, m = shard_edges(senders, receivers, edge_mask, N_DEV)
        out = edge_partitioned_aggregate(edge_mesh, jnp.array(h), jnp.array(s),
                                         jnp.array(r), jnp.array(m), eps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, edge_mesh):
        rng = np.random.default_rng(1)
        n, e, f = 64, 256, 16
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = rng.integers(0, n, e).astype(np.int32)
        edge_mask = np.ones(e, np.float32)
        h = rng.normal(size=(n, f)).astype(np.float32)
        eps = jnp.float32(0.0)

        def loss_ref(hh):
            return jnp.sum(gin_aggregate_coo(hh, jnp.array(senders),
                                             jnp.array(receivers),
                                             jnp.array(edge_mask), eps) ** 2)

        s, r, m = shard_edges(senders, receivers, edge_mask, N_DEV)

        def loss_sharded(hh):
            return jnp.sum(edge_partitioned_aggregate(
                edge_mesh, hh, jnp.array(s), jnp.array(r), jnp.array(m),
                eps) ** 2)

        g_ref = jax.grad(loss_ref)(jnp.array(h))
        g_sh = jax.grad(loss_sharded)(jnp.array(h))
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)


class TestGatheredNTXent:
    def test_matches_unsharded(self, mesh):
        rng = np.random.default_rng(2)
        n = 64  # divisible by 8
        z1 = rng.normal(size=(n, 16)).astype(np.float32)
        z2 = rng.normal(size=(n, 16)).astype(np.float32)
        valid = (rng.random(n) < 0.8)
        temp = jnp.float32(0.4)

        ref_sum, ref_rows = nt_xent_loss(jnp.array(z1), jnp.array(z2), temp,
                                         jnp.array(valid))

        def local(z1_l, z2_l, v_l):
            return nt_xent_loss(z1_l, z2_l, temp, v_l, axis_name="data")

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=(P(), P()), check_vma=False)
        got_sum, got_rows = fn(jnp.array(z1), jnp.array(z2), jnp.array(valid))
        # Gathered order is a permutation of rows — NT-Xent is row-permutation
        # invariant in its sum.
        np.testing.assert_allclose(float(got_rows), float(ref_rows))
        np.testing.assert_allclose(float(got_sum), float(ref_sum), rtol=1e-4)


def _domain_batch(rng, g, npg, epg, d):
    n, e = g * npg, g * epg
    senders = np.concatenate([rng.integers(0, npg, epg) + i * npg
                              for i in range(g)]).astype(np.int32)
    receivers = np.concatenate([rng.integers(0, npg, epg) + i * npg
                                for i in range(g)]).astype(np.int32)
    return GraphBatch(
        x=rng.normal(size=(n, d)).astype(np.float32),
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
        graph_properties=rng.normal(size=(g, 12)).astype(np.float32))


def _split_batch(batch, n_dev):
    """Shard graphs round-robin into n_dev stacked sub-batches (same layout
    rules as parallel.data_parallel.shard_sampler_step, fixed sizes here)."""
    g = batch.num_graphs
    gl = g // n_dev
    npg = batch.num_nodes // g
    epg = batch.num_edges // g
    subs = []
    for dev in range(n_dev):
        sel = list(range(dev, g, n_dev))
        node_rows = np.concatenate([np.arange(i * npg, (i + 1) * npg) for i in sel])
        edge_rows = np.concatenate([np.arange(i * epg, (i + 1) * epg) for i in sel])
        remap = {orig: new for new, orig in enumerate(sel)}
        sub = GraphBatch(
            x=batch.x[node_rows],
            senders=(batch.senders[edge_rows] % npg
                     + np.repeat(np.arange(gl), epg) * npg).astype(np.int32),
            receivers=(batch.receivers[edge_rows] % npg
                       + np.repeat(np.arange(gl), epg) * npg).astype(np.int32),
            edge_mask=batch.edge_mask[edge_rows],
            edge_graph=np.repeat(np.arange(gl), epg).astype(np.int32),
            node_mask=batch.node_mask[node_rows],
            node_graph=np.repeat(np.arange(gl), npg).astype(np.int32),
            graph_mask=np.asarray(batch.graph_mask)[sel],
            node_start=(np.arange(gl) * npg).astype(np.int32),
            n_node=np.asarray(batch.n_node)[sel],
            n_edge=np.asarray(batch.n_edge)[sel],
            y=np.asarray(batch.y)[sel],
            graph_properties=np.asarray(batch.graph_properties)[sel])
        subs.append(sub)
    return jax.tree.map(lambda *xs: np.stack(xs), *subs)


def _rank_within_group(group_ids, num_groups):
    """Index of each row within its (contiguous) group, via scatter-min."""
    n = group_ids.shape[0]
    idx = jnp.arange(n)
    first = jnp.full((num_groups,), n, idx.dtype).at[group_ids].min(idx)
    return idx - first[group_ids]


def _det_select(key, group_ids, row_mask, num_select):
    """Deterministic stand-in for masked_randperm_select: first-k valid rows
    of each group. Layout-invariant (depends only on within-graph order), so
    the DP sub-batches select exactly the rows the full batch selects."""
    del key
    rank = _rank_within_group(group_ids, num_select.shape[0])
    return (rank < num_select[group_ids]) & (row_mask > 0)


def _det_negsample(key, und, edge_graph, edge_mask, node_start, n_node):
    """Deterministic stand-in for batched_negative_sampling: every edge slot
    gets the (first, last) node pair of its own graph."""
    del key, und, edge_mask
    s = node_start[edge_graph]
    r = node_start[edge_graph] + jnp.maximum(n_node[edge_graph] - 1, 0)
    return s.astype(jnp.int32), r.astype(jnp.int32)


def _det_two_views(key, batch):
    """Deterministic stand-in for create_two_views: v1 keeps everything,
    v2 drops the first node of each graph and scales features."""
    from gnn_pretraining_tpu.pretrain.augmentations import GraphView

    del key
    valid = batch.node_mask.astype(bool)
    rank = _rank_within_group(batch.node_graph, batch.num_graphs)
    keep1 = valid
    keep2 = valid & (rank != 0)

    def ek(keep):
        return (batch.edge_mask.astype(bool) & keep[batch.senders]
                & keep[batch.receivers]).astype(jnp.float32)

    v1 = GraphView(x=batch.x, node_keep=keep1.astype(jnp.float32),
                   edge_keep=ek(keep1))
    v2 = GraphView(x=batch.x * 0.9, node_keep=keep2.astype(jnp.float32),
                   edge_keep=ek(keep2))
    return v1, v2, v1.node_keep * v2.node_keep


ALL_TASKS = ("node_feat_mask", "link_pred", "node_contrast",
             "graph_contrast", "graph_prop", "domain_adv")


class TestDataParallelTasks:
    @pytest.mark.parametrize("task", ALL_TASKS)
    def test_task_loss_and_grads_match(self, mesh, monkeypatch, task):
        """DP loss + pmean'd grads == single-device, for EVERY task.

        Dropout is off and the stochastic samplers (node selection, negative
        sampling, view augmentation) are replaced with deterministic
        layout-invariant stand-ins (each has its own unit tests); what this
        test pins down is the DP-specific machinery — psum'd size-weighted
        sums, gathered NT-Xent negatives, SyncBN statistics — against the
        single-device semantics (VERDICT r1 next-round #4).
        """
        import gnn_pretraining_tpu.pretrain.tasks as tasks_mod

        monkeypatch.setattr(config, "DROPOUT_RATE", 0.0)
        monkeypatch.setattr(config, "DOMAIN_CLASSIFIER_DROPOUT_RATE", 0.0)
        # 2 layers instead of 5: the exactness argument is per-layer, and the
        # full-depth CPU shard_map compiles take tens of minutes.
        monkeypatch.setattr(config, "GNN_NUM_LAYERS", 2)
        monkeypatch.setattr(tasks_mod, "masked_randperm_select", _det_select)
        monkeypatch.setattr(tasks_mod, "batched_negative_sampling",
                            _det_negsample)
        monkeypatch.setattr(tasks_mod, "create_two_views", _det_two_views)

        rng = np.random.default_rng(5)
        domains = ("MUTAG", "PROTEINS")
        batches = {d: _domain_batch(rng, g=8, npg=6, epg=10, d=7)
                   for d in domains}

        class _Cfg:
            active_tasks = (task,)
            pretrain_domains = domains
            seed = 0

        from gnn_pretraining_tpu.pretrain.pretrain import _init_model_impl

        model1, variables = _init_model_impl(_Cfg, batches, "dense")

        ctx1 = TaskContext(jnp.float32(0.5), jnp.float32(0.3), True, None)

        def loss1(p):
            loss, pd, _ = compute_task_loss(task, model1, p,
                                            variables["batch_stats"], batches,
                                            jax.random.PRNGKey(7), ctx1)
            return loss, pd

        (ref_loss, ref_pd), ref_grad = jax.value_and_grad(
            loss1, has_aux=True)(variables["params"])

        model_dp = PretrainableGNN(domain_names=domains, task_names=(task,),
                                   aggregation="dense", axis_name="data")
        stacked = {d: _split_batch(b, N_DEV) for d, b in batches.items()}

        def local(params, stats, sh_batches):
            b = jax.tree.map(lambda x: x[0], sh_batches)
            ctx = TaskContext(jnp.float32(0.5), jnp.float32(0.3), True, "data")

            def loss_fn(p):
                loss, pd, _ = compute_task_loss(task, model_dp, p, stats, b,
                                                jax.random.PRNGKey(7), ctx)
                return loss, pd

            (loss, pd), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, pd, jax.lax.pmean(g, "data")

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), P("data")),
                       out_specs=(P(), P(), P()), check_vma=False)
        dp_loss, dp_pd, dp_grad = fn(variables["params"],
                                     variables["batch_stats"], stacked)
        np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-4)
        for d in domains:
            np.testing.assert_allclose(float(dp_pd[d]), float(ref_pd[d]),
                                       rtol=1e-4, err_msg=d)
        for (ka, ref_l), (kb, dp_l) in zip(
                jax.tree_util.tree_leaves_with_path(ref_grad),
                jax.tree_util.tree_leaves_with_path(dp_grad)):
            np.testing.assert_allclose(np.asarray(dp_l), np.asarray(ref_l),
                                       rtol=2e-3, atol=2e-5,
                                       err_msg=jax.tree_util.keystr(ka))

    def test_graph_prop_loss_and_grads_match(self, mesh, monkeypatch):
        # Disable dropout so the only nondeterminism sources are removed.
        monkeypatch.setattr(config, "DROPOUT_RATE", 0.0)
        rng = np.random.default_rng(3)
        batch = _domain_batch(rng, g=8, npg=6, epg=10, d=7)
        model1 = PretrainableGNN(domain_names=("MUTAG",),
                                 task_names=("graph_prop",))
        variables = model1.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(batch.x), jnp.asarray(batch.node_mask), "MUTAG", True,
            senders=jnp.asarray(batch.senders),
            receivers=jnp.asarray(batch.receivers),
            edge_mask=jnp.asarray(batch.edge_mask))
        from gnn_pretraining_tpu.pretrain.pretrain import _init_heads

        class _Cfg:
            active_tasks = ("graph_prop",)
            pretrain_domains = ("MUTAG",)
            seed = 0

        variables = _init_heads(model1, _Cfg, variables, {"MUTAG": batch})

        ctx1 = TaskContext(jnp.float32(0.5), jnp.float32(0.0), True, None)

        def loss1(p):
            loss, _, _ = compute_task_loss("graph_prop", model1, p,
                                           variables["batch_stats"],
                                           {"MUTAG": batch},
                                           jax.random.PRNGKey(7), ctx1)
            return loss

        ref_loss, ref_grad = jax.value_and_grad(loss1)(variables["params"])

        model_dp = PretrainableGNN(domain_names=("MUTAG",),
                                   task_names=("graph_prop",),
                                   axis_name="data")
        stacked = {"MUTAG": _split_batch(batch, N_DEV)}

        def local(params, stats, batches):
            b = jax.tree.map(lambda x: x[0], batches)
            ctx = TaskContext(jnp.float32(0.5), jnp.float32(0.0), True, "data")

            def loss_fn(p):
                loss, _, _ = compute_task_loss("graph_prop", model_dp, p, stats,
                                               b, jax.random.PRNGKey(7), ctx)
                return loss

            loss, g = jax.value_and_grad(loss_fn)(params)
            return loss, jax.lax.pmean(g, "data")

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), P("data")), out_specs=(P(), P()), check_vma=False)
        dp_loss, dp_grad = fn(variables["params"], variables["batch_stats"],
                              stacked)
        np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-4)
        for ref_l, dp_l in zip(jax.tree.leaves(ref_grad),
                               jax.tree.leaves(dp_grad)):
            np.testing.assert_allclose(np.asarray(dp_l), np.asarray(ref_l),
                                       rtol=2e-3, atol=2e-5)

    def test_full_dp_multitask_step_runs(self, mesh):
        """s1-style (NFM+LP) + contrastive DP step executes on the mesh."""
        import jax.numpy as jnp
        from gnn_pretraining_tpu.parallel.data_parallel import make_dp_train_step
        from gnn_pretraining_tpu.pretrain.optimizers import (
            create_task_specific_optimizer,
        )
        from gnn_pretraining_tpu.pretrain.pretrain import TrainState, _init_heads

        rng = np.random.default_rng(4)
        batch = _domain_batch(rng, g=8, npg=6, epg=10, d=7)
        tasks = ("node_feat_mask", "link_pred", "node_contrast",
                 "graph_contrast")
        model = PretrainableGNN(domain_names=("MUTAG",), task_names=tasks,
                                axis_name="data")
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(batch.x), jnp.asarray(batch.node_mask), "MUTAG", False,
            senders=jnp.asarray(batch.senders),
            receivers=jnp.asarray(batch.receivers),
            edge_mask=jnp.asarray(batch.edge_mask))

        class _Cfg:
            active_tasks = tasks
            pretrain_domains = ("MUTAG",)
            seed = 0

        variables = _init_heads(model, _Cfg, variables, {"MUTAG": batch})
        optimizer = create_task_specific_optimizer(variables["params"], tasks)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=optimizer.init(variables["params"]),
                           opt_step=jnp.int32(0),
                           balancer_step=jnp.int32(0))
        step_fn = make_dp_train_step(model, _Cfg, optimizer, 100, mesh)
        stacked = {"MUTAG": _split_batch(batch, N_DEV)}
        new_state, metrics = step_fn(state, stacked, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["train/loss/total"]))
        assert int(new_state.opt_step) == 1
        # params actually moved
        diff = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)))
        assert diff > 0


class TestNodePartition:
    """Boundary-aware halo-exchange aggregation == single-device (VERDICT #5)."""

    def _random_graph(self, seed, n, e, f):
        rng = np.random.default_rng(seed)
        return (rng.integers(0, n, e).astype(np.int32),
                rng.integers(0, n, e).astype(np.int32),
                (rng.random(e) < 0.9).astype(np.float32),
                rng.normal(size=(n, f)).astype(np.float32))

    def test_forward_matches_single_device(self, edge_mesh):
        from gnn_pretraining_tpu.parallel.node_partition import (
            build_node_partition_plan,
            node_partitioned_aggregate,
            pad_node_rows,
        )

        n, e, f = 200, 1000, 32
        senders, receivers, edge_mask, h = self._random_graph(0, n, e, f)
        eps = jnp.float32(0.25)
        ref = gin_aggregate_coo(jnp.array(h), jnp.array(senders),
                                jnp.array(receivers), jnp.array(edge_mask),
                                eps)
        plan = build_node_partition_plan(senders, receivers, edge_mask, n,
                                         N_DEV)
        hp = pad_node_rows(h, plan)
        out = node_partitioned_aggregate(edge_mesh, jnp.array(hp), plan, eps)
        np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # padding rows only carry the (1+eps)·h term of zero rows
        np.testing.assert_allclose(np.asarray(out)[n:], 0.0, atol=1e-6)

    def test_gradients_match(self, edge_mesh):
        from gnn_pretraining_tpu.parallel.node_partition import (
            build_node_partition_plan,
            node_partitioned_aggregate,
            pad_node_rows,
        )

        n, e, f = 64, 256, 16
        senders, receivers, edge_mask, h = self._random_graph(1, n, e, f)
        eps = jnp.float32(0.1)
        plan = build_node_partition_plan(senders, receivers, edge_mask, n,
                                         N_DEV)

        def loss_ref(hh):
            return jnp.sum(gin_aggregate_coo(hh, jnp.array(senders),
                                             jnp.array(receivers),
                                             jnp.array(edge_mask), eps) ** 2)

        def loss_np(hh_padded):
            out = node_partitioned_aggregate(edge_mesh, hh_padded, plan, eps)
            return jnp.sum(out[:n] ** 2)

        g_ref = jax.grad(loss_ref)(jnp.array(h))
        g_np = jax.grad(loss_np)(jnp.array(pad_node_rows(h, plan)))
        np.testing.assert_allclose(np.asarray(g_np)[:n], np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_halo_bytes_shrink_with_cut(self):
        from gnn_pretraining_tpu.parallel.node_partition import (
            build_node_partition_plan,
        )

        rng = np.random.default_rng(2)
        n, e = 512, 4096
        # Block-diagonal graph: edges stay within contiguous 64-node blocks,
        # so a contiguous 8-way partition has zero cut.
        block = rng.integers(0, 8, e)
        s = (block * 64 + rng.integers(0, 64, e)).astype(np.int32)
        r = (block * 64 + rng.integers(0, 64, e)).astype(np.int32)
        m = np.ones(e, np.float32)
        plan_zero = build_node_partition_plan(s, r, m, n, 8)
        # Fully random graph: nearly every sender is remote somewhere.
        s2 = rng.integers(0, n, e).astype(np.int32)
        r2 = rng.integers(0, n, e).astype(np.int32)
        plan_rand = build_node_partition_plan(s2, r2, m, n, 8)
        f = 256
        assert plan_zero.halo_bytes_per_layer(f) < plan_rand.halo_bytes_per_layer(f)
        # zero-cut halo is just the minimum placeholder row
        assert plan_zero.h_pad == 1
        # the psum path always moves the full [N, F] ring regardless of cut
        assert plan_zero.psum_bytes_per_layer(f) == plan_rand.psum_bytes_per_layer(f)
        assert plan_zero.halo_bytes_per_layer(f) < plan_zero.psum_bytes_per_layer(f)


class TestDomainAdvLabels:
    def test_single_domain_eval_uses_canonical_labels(self, monkeypatch):
        """Per-domain eval passes single-domain dicts; the adversarial label
        must come from model.domain_names (the reference's fixed
        domain_to_idx, tasks.py:318), not the dict enumeration index — which
        labeled every domain 0 and made eval CE meaningless for all domains
        but the first."""
        monkeypatch.setattr(config, "DROPOUT_RATE", 0.0)
        monkeypatch.setattr(config, "DOMAIN_CLASSIFIER_DROPOUT_RATE", 0.0)
        monkeypatch.setattr(config, "GNN_NUM_LAYERS", 2)

        rng = np.random.default_rng(11)
        domains = ("MUTAG", "PROTEINS")
        batches = {d: _domain_batch(rng, g=8, npg=6, epg=10, d=7)
                   for d in domains}

        class _Cfg:
            active_tasks = ("domain_adv",)
            pretrain_domains = domains
            seed = 0

        from gnn_pretraining_tpu.pretrain.pretrain import _init_model_impl

        model, variables = _init_model_impl(_Cfg, batches, "dense")
        ctx = TaskContext(jnp.float32(0.5), jnp.float32(0.3), False, None)
        key = jax.random.PRNGKey(3)

        _, pd_full, _ = compute_task_loss(
            "domain_adv", model, variables["params"],
            variables["batch_stats"], batches, key, ctx)
        for d in domains:
            _, pd_single, _ = compute_task_loss(
                "domain_adv", model, variables["params"],
                variables["batch_stats"], {d: batches[d]}, key, ctx)
            np.testing.assert_allclose(float(pd_single[d]), float(pd_full[d]),
                                       rtol=1e-5)
