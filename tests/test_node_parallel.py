"""Node-partitioned (halo-exchange) fine-tune steps match single-device
semantics on the 8-device virtual mesh, and the production CLI reaches them.

The edge-parallel path replicates activations and psums [N, F] partials;
this path shards the node rows themselves (finetune/node_parallel.py), so
exactness additionally covers the halo exchange, SyncBN over sharded rows,
and the all_gather head/loss composition."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.finetune.finetune import (
    FTState,
    create_finetune_optimizer,
    make_lp_steps,
    make_nc_steps,
)
from gnn_pretraining_tpu.finetune.mining import (
    build_forbidden_mask,
    candidate_count,
    hard_count,
)
from gnn_pretraining_tpu.finetune.node_parallel import (
    make_lp_steps_node_parallel,
    make_nc_steps_node_parallel,
)
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.ops.spmm import build_dense_adjacency
from gnn_pretraining_tpu.parallel.mesh import make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=1, n_edge=N_DEV)


def _graph(n=96, e=400, d=40, seed=0):
    from gnn_pretraining_tpu.data.batch import GraphBatch

    rng = np.random.default_rng(seed)
    return GraphBatch(
        x=rng.normal(size=(n, d)).astype(np.float32),
        senders=rng.integers(0, n, e).astype(np.int32),
        receivers=rng.integers(0, n, e).astype(np.int32),
        edge_mask=np.ones(e, np.float32),
        edge_graph=np.zeros(e, np.int32),
        node_mask=np.ones(n, np.float32),
        node_graph=np.zeros(n, np.int32),
        graph_mask=np.ones(1, np.float32),
        node_start=np.zeros(1, np.int32),
        n_node=np.full(1, n, np.int32),
        n_edge=np.full(1, e, np.int32),
        y=np.zeros(1, np.int32),
        graph_properties=np.zeros((1, 12), np.float32))


def _nc_setup(g, domain="Cora_NC"):
    cfg = config.FinetuneConfig(domain_name=domain,
                                finetune_strategy="full_finetune",
                                pretrained_scheme="b1", seed=42)
    model = FinetuneGNN(domain_name=domain, aggregation="coo")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(g.x), jnp.asarray(g.node_mask), False,
        senders=jnp.asarray(g.senders), receivers=jnp.asarray(g.receivers),
        edge_mask=jnp.asarray(g.edge_mask))
    optimizer, labels, _ = create_finetune_optimizer(variables["params"], cfg)
    state = FTState(params=variables["params"],
                    batch_stats=variables["batch_stats"],
                    opt_state=optimizer.init(variables["params"]))
    return cfg, model, optimizer, labels, state


class TestNodePartitionedNC:
    def test_eval_matches_single_device(self, mesh):
        g = _graph()
        cfg, model, optimizer, labels, state = _nc_setup(g)
        adj = build_dense_adjacency(jnp.asarray(g.senders),
                                    jnp.asarray(g.receivers),
                                    jnp.asarray(g.edge_mask), g.num_nodes)
        _, eval_ref = make_nc_steps(model, cfg, optimizer, labels, g, adj)
        _, eval_np = make_nc_steps_node_parallel(cfg, optimizer, labels, g,
                                                 mesh, N_DEV)
        ix = jnp.arange(0, g.num_nodes, 3)
        y = jnp.asarray(np.random.default_rng(1).integers(0, 7, len(ix)))
        l_ref, y_ref, p_ref, pr_ref = jax.device_get(eval_ref(state, ix, y))
        l_np, y_np, p_np, pr_np = jax.device_get(eval_np(state, ix, y))
        np.testing.assert_allclose(l_np, l_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pr_np, pr_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(p_np, p_ref)

    def test_train_step_matches_single_device_no_dropout(self, mesh,
                                                         monkeypatch):
        # Sharded rows draw independent dropout noise (deliberately), so
        # bit-exact train equality is checked with the rate at 0; SyncBN
        # train statistics and the optimizer update remain fully exercised.
        monkeypatch.setattr(config, "DROPOUT_RATE", 0.0)
        g = _graph(seed=3)
        cfg, model, optimizer, labels, state = _nc_setup(g)
        adj = build_dense_adjacency(jnp.asarray(g.senders),
                                    jnp.asarray(g.receivers),
                                    jnp.asarray(g.edge_mask), g.num_nodes)
        train_ref, _ = make_nc_steps(model, cfg, optimizer, labels, g, adj)
        train_np, _ = make_nc_steps_node_parallel(cfg, optimizer, labels, g,
                                                  mesh, N_DEV)
        ix = jnp.arange(0, g.num_nodes, 2)
        y = jnp.asarray(np.random.default_rng(2).integers(0, 7, len(ix)))
        rng = jax.random.PRNGKey(5)
        # make_nc_steps donates its state argument — give it a private copy
        state_ref = jax.tree.map(lambda a: jnp.array(a), state)
        s_ref, l_ref, *_ = train_ref(state_ref, ix, y, rng)
        s_np, l_np, *_ = train_np(state, ix, y, rng)
        np.testing.assert_allclose(float(l_np), float(l_ref),
                                   rtol=1e-5, atol=1e-6)
        # SyncBN over sharded rows must reproduce the global running stats.
        for a, b in zip(jax.tree.leaves(s_ref.batch_stats),
                        jax.tree.leaves(s_np.batch_stats)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)

    def test_gradients_match_single_device(self, mesh, monkeypatch):
        """Gradient-level exactness (the right oracle: the first AdamW step
        is elementwise lr·sign(g), so post-update params amplify f32 noise
        on BN-shadowed bias leaves whose true gradient is exactly zero)."""
        from jax.flatten_util import ravel_pytree
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from gnn_pretraining_tpu.finetune.node_parallel import (
            _local_model,
            _prepare,
        )

        monkeypatch.setattr(config, "DROPOUT_RATE", 0.0)
        g = _graph(seed=3)
        cfg, model, optimizer, labels, state = _nc_setup(g)
        ix = jnp.arange(0, g.num_nodes, 2)
        y = jnp.asarray(np.random.default_rng(2).integers(0, 7, len(ix)))
        params, stats = state.params, state.batch_stats

        def _ce(logits):
            sel = logits[ix]
            logp = jax.nn.log_softmax(sel, -1)
            return jnp.mean(-jnp.take_along_axis(
                logp, y[:, None].astype(jnp.int32), 1)[:, 0])

        def loss_ref(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": stats}, jnp.asarray(g.x),
                jnp.asarray(g.node_mask), True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(9)},
                senders=jnp.asarray(g.senders),
                receivers=jnp.asarray(g.receivers),
                edge_mask=jnp.asarray(g.edge_mask))
            return _ce(logits)

        g_ref = jax.grad(loss_ref)(params)
        plan, x_sh, nm_sh, plan_sh = _prepare(g, N_DEV)

        def local_loss(p, x_loc, nm_loc, *plan_slices):
            m = _local_model("Cora_NC", plan, plan_slices, N_DEV)
            logits_loc, _ = m.apply(
                {"params": p, "batch_stats": stats}, x_loc, nm_loc, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(9)})
            return _ce(jax.lax.all_gather(logits_loc, "edge", axis=0,
                                          tiled=True))

        def body(p, x_loc, nm_loc, *ps):
            ps = [a[0] for a in ps]
            gr = jax.grad(local_loss)(p, x_loc[0], nm_loc[0], *ps)
            return jax.tree.map(lambda t: jax.lax.pmean(t, "edge"), gr)

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(), P("edge"), P("edge")) + (P("edge"),) * 7,
                       out_specs=P(), check_vma=False)
        g_np = jax.jit(fn)(params, x_sh, nm_sh, *plan_sh)
        flat_r, _ = ravel_pytree(g_ref)
        flat_n, _ = ravel_pytree(g_np)
        rel = (np.linalg.norm(np.asarray(flat_n) - np.asarray(flat_r))
               / np.linalg.norm(np.asarray(flat_r)))
        assert rel < 1e-5, rel
        # Per-leaf, excluding leaves whose true gradient is 0 (biases
        # directly upstream of BatchNorm: both paths produce f32 noise).
        for (k, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_ref)[0],
                jax.tree_util.tree_flatten_with_path(g_np)[0]):
            a, b = np.asarray(a), np.asarray(b)
            if np.linalg.norm(a) < 1e-6 * a.size:
                continue
            leaf_rel = np.linalg.norm(b - a) / np.linalg.norm(a)
            assert leaf_rel < 1e-4, (jax.tree_util.keystr(k), leaf_rel)


class TestNodePartitionedLP:
    def test_eval_matches_single_device(self, mesh):
        g = _graph(n=80, e=320, d=24, seed=7)
        cfg = config.FinetuneConfig(domain_name="Cora_LP",
                                    finetune_strategy="full_finetune",
                                    pretrained_scheme="b1", seed=42)
        model = FinetuneGNN(domain_name="Cora_LP", aggregation="coo")
        e0 = jnp.asarray(np.stack([np.arange(16), np.arange(16) + 1]))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(g.x), jnp.asarray(g.node_mask), False,
            senders=jnp.asarray(g.senders), receivers=jnp.asarray(g.receivers),
            edge_mask=jnp.asarray(g.edge_mask),
            score_senders=e0[0], score_receivers=e0[1])
        optimizer, labels, _ = create_finetune_optimizer(variables["params"],
                                                         cfg)
        state = FTState(params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=optimizer.init(variables["params"]))
        train_edges = np.stack([np.asarray(g.senders)[:100],
                                np.asarray(g.receivers)[:100]])
        adj = build_dense_adjacency(jnp.asarray(g.senders),
                                    jnp.asarray(g.receivers),
                                    jnp.asarray(g.edge_mask), g.num_nodes)
        forbidden = build_forbidden_mask(g.num_nodes, train_edges,
                                         node_mask=g.node_mask)
        n_cand = candidate_count(g.num_nodes, train_edges,
                                 num_real_nodes=g.num_nodes)
        num_hard = hard_count(n_cand, 16)
        _, eval_ref = make_lp_steps(model, cfg, optimizer, labels, g, adj,
                                    forbidden, num_hard)
        _, eval_np = make_lp_steps_node_parallel(cfg, optimizer, labels, g,
                                                 mesh, N_DEV, forbidden,
                                                 num_hard)
        edges = e0
        y = jnp.asarray(np.random.default_rng(4).integers(0, 2, 16),
                        jnp.float32)
        m = jnp.ones(16)
        l_ref, y_ref, p_ref, pr_ref = jax.device_get(eval_ref(state, edges, y, m))
        l_np, y_np, p_np, pr_np = jax.device_get(eval_np(state, edges, y, m))
        np.testing.assert_allclose(l_np, l_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pr_np, pr_ref, rtol=1e-4, atol=1e-5)


class TestDriverParallelCLI:
    """The production driver reaches the sharded paths with one flag
    (VERDICT r4 next-round #4): same cell, --partition node vs none, equal
    metrics with dropout disabled."""

    @pytest.fixture(scope="class")
    def store(self, tmp_path_factory):
        from gnn_pretraining_tpu.data import setup as data_setup

        tmp = tmp_path_factory.mktemp("drv_store")
        data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                        synthetic_scale=0.06)
        return tmp

    def _run(self, store, out, partition, monkeypatch):
        import run_finetune

        monkeypatch.setattr(config, "DROPOUT_RATE", 0.0)
        argv = ["run_finetune.py", "--domain_name", "Cora_NC",
                "--finetune_strategy", "full_finetune",
                "--pretrained_scheme", "b1", "--seed", "42",
                "--epochs", "2", "--no_wandb",
                "--processed_dir", str(store), "--out_root", str(out),
                "--aggregation", "coo", "--partition", partition]
        monkeypatch.setattr(sys, "argv", argv)
        run_finetune.main()
        import json

        summary = (out / "metrics" / config.FINETUNE_PROJECT_NAME
                   / "Cora_NC_full_finetune_b1_42.summary.json")
        return json.loads(summary.read_text())

    def test_partition_node_cli_matches_single_device(self, store, tmp_path,
                                                      monkeypatch):
        ref = self._run(store, tmp_path / "ref", "none", monkeypatch)
        par = self._run(store, tmp_path / "np", "node", monkeypatch)
        assert par["fidelity/completed"] == 1
        np.testing.assert_allclose(par["test/loss"], ref["test/loss"],
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(par["test/accuracy"], ref["test/accuracy"],
                                   rtol=0, atol=1e-9)


class TestDriverDPPretrain:
    """run_pretrain.py --dp auto engages make_dp_train_step over all local
    devices from the production CLI (VERDICT r4 next-round #4)."""

    def test_dp_auto_pretrain_completes(self, tmp_path, monkeypatch):
        from gnn_pretraining_tpu.data import setup as data_setup
        import run_pretrain

        store = tmp_path / "store"
        data_setup.main(processed_dir=store, raw_dir=store / "raw",
                        synthetic_scale=0.06)
        out = tmp_path / "out"
        argv = ["run_pretrain.py", "--exp_name", "b2", "--seed", "42",
                "--epochs", "1", "--no_wandb", "--aggregation", "coo",
                "--dp", "auto", "--processed_dir", str(store),
                "--out_root", str(out)]
        monkeypatch.setattr(sys, "argv", argv)
        run_pretrain.main()
        import json

        summary = (out / "metrics" / config.PRETRAIN_PROJECT_NAME
                   / "b2_42.summary.json")
        s = json.loads(summary.read_text())
        assert s["fidelity/completed"] == 1
        assert np.isfinite(s["val/loss/total"])
