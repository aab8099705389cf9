"""Full-model edge-partitioned execution: FinetuneGNN under shard_map with
its edge list sharded matches the single-device forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.parallel.edge_partition import shard_edges
from gnn_pretraining_tpu.parallel.mesh import make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=1, n_edge=N_DEV)


class TestEdgePartitionedFinetuneModel:
    def test_nc_forward_matches_single_device(self, mesh):
        rng = np.random.default_rng(0)
        n, e, d = 96, 400, 21
        x = rng.normal(size=(n, d)).astype(np.float32)
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = rng.integers(0, n, e).astype(np.int32)
        edge_mask = np.ones(e, np.float32)
        node_mask = np.ones(n, np.float32)

        # single-device reference (COO path, eval mode => deterministic)
        ref_model = FinetuneGNN(domain_name="ENZYMES", aggregation="coo")
        variables = ref_model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), jnp.asarray(node_mask), False,
            senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
            edge_mask=jnp.asarray(edge_mask),
            node_graph=jnp.zeros(n, jnp.int32), num_graphs=1)
        ref = ref_model.apply(variables, jnp.asarray(x), jnp.asarray(node_mask),
                              False, senders=jnp.asarray(senders),
                              receivers=jnp.asarray(receivers),
                              edge_mask=jnp.asarray(edge_mask),
                              node_graph=jnp.zeros(n, jnp.int32), num_graphs=1)

        # edge-partitioned: same params, edges sharded over the mesh
        ep_model = FinetuneGNN(domain_name="ENZYMES", aggregation="coo",
                               edge_axis="edge")
        s, r, m = shard_edges(senders, receivers, edge_mask, N_DEV)

        def fwd(params, stats, xx, s_loc, r_loc, m_loc):
            return ep_model.apply(
                {"params": params, "batch_stats": stats}, xx,
                jnp.asarray(node_mask), False, senders=s_loc,
                receivers=r_loc, edge_mask=m_loc,
                node_graph=jnp.zeros(n, jnp.int32), num_graphs=1)

        fn = shard_map(fwd, mesh=mesh,
                       in_specs=(P(), P(), P(), P("edge"), P("edge"), P("edge")),
                       out_specs=P(), check_vma=False)
        out = fn(variables["params"], variables["batch_stats"],
                 jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_gradients_flow_through_sharded_model(self, mesh):
        rng = np.random.default_rng(1)
        n, e, d = 48, 160, 7
        x = rng.normal(size=(n, d)).astype(np.float32)
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = rng.integers(0, n, e).astype(np.int32)
        edge_mask = np.ones(e, np.float32)
        node_mask = np.ones(n, np.float32)

        model = FinetuneGNN(domain_name="PTC_MR", aggregation="coo",
                            edge_axis="edge")
        ref_model = FinetuneGNN(domain_name="PTC_MR", aggregation="coo")
        variables = ref_model.init(
            {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            jnp.asarray(x), jnp.asarray(node_mask), False,
            senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
            edge_mask=jnp.asarray(edge_mask),
            node_graph=jnp.zeros(n, jnp.int32), num_graphs=1)

        s, r, m = shard_edges(senders, receivers, edge_mask, N_DEV)

        def loss_sharded(params):
            def fwd(p, stats, s_loc, r_loc, m_loc):
                out = model.apply(
                    {"params": p, "batch_stats": stats}, jnp.asarray(x),
                    jnp.asarray(node_mask), False, senders=s_loc,
                    receivers=r_loc, edge_mask=m_loc,
                    node_graph=jnp.zeros(n, jnp.int32), num_graphs=1)
                return jnp.sum(out ** 2)

            fn = shard_map(fwd, mesh=mesh,
                           in_specs=(P(), P(), P("edge"), P("edge"), P("edge")),
                           out_specs=P(), check_vma=False)
            return fn(params, variables["batch_stats"], jnp.asarray(s),
                      jnp.asarray(r), jnp.asarray(m))

        def loss_ref(params):
            out = ref_model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(x), jnp.asarray(node_mask), False,
                senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
                edge_mask=jnp.asarray(edge_mask),
                node_graph=jnp.zeros(n, jnp.int32), num_graphs=1)
            return jnp.sum(out ** 2)

        g_sh = jax.grad(loss_sharded)(variables["params"])
        g_ref = jax.grad(loss_ref)(variables["params"])
        # Depending on shard_map's transpose of the replicated loss, grads may
        # come out as g or n_dev*g uniformly; determine the single global
        # factor and then require elementwise equality.
        num = sum(float(np.abs(np.asarray(a)).sum()) for a in jax.tree.leaves(g_sh))
        den = sum(float(np.abs(np.asarray(b)).sum()) for b in jax.tree.leaves(g_ref))
        factor = num / max(den, 1e-12)
        assert any(abs(factor - c) / c < 1e-3 for c in (1.0, float(N_DEV))), factor
        for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a) / factor, np.asarray(b),
                                       rtol=1e-3, atol=1e-5)


class TestDataParallelGCFinetune:
    def test_loss_matches_single_device(self, mesh, monkeypatch):
        """DP GC eval loss over sharded sub-batches == single-device loss."""
        import pathlib
        import tempfile

        from gnn_pretraining_tpu import config as cfg_mod
        from gnn_pretraining_tpu.data import setup as data_setup
        from gnn_pretraining_tpu.data.batch import GraphStore
        from gnn_pretraining_tpu.data.loaders import create_finetune_arrays
        from gnn_pretraining_tpu.finetune.finetune import (
            FTState,
            create_finetune_optimizer,
            make_gc_steps,
            _init_finetune_model,
        )
        from gnn_pretraining_tpu.finetune.gc_data_parallel import (
            build_sharded_gc_batches,
            make_gc_steps_data_parallel,
        )
        from gnn_pretraining_tpu.parallel.mesh import make_mesh

        tmp = pathlib.Path(tempfile.mkdtemp())
        data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                        synthetic_scale=0.1)
        cfg = cfg_mod.FinetuneConfig(domain_name="ENZYMES",
                                     finetune_strategy="full_finetune",
                                     pretrained_scheme="b1", seed=42)
        data = {s: create_finetune_arrays("ENZYMES", s, 32, processed_dir=tmp)
                for s in ("val", "test", "train")}
        model, variables = _init_finetune_model(cfg, data, "coo", 42)
        optimizer, labels, _ = create_finetune_optimizer(variables["params"], cfg)
        state = FTState(variables["params"], variables["batch_stats"],
                        optimizer.init(variables["params"]))

        _, eval_ref = make_gc_steps(model, cfg, optimizer, labels)
        ref_loss = float(eval_ref(state, data["val"].batches[0])[0])

        dp_mesh = make_mesh(n_data=N_DEV)
        from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN

        dp_model = FinetuneGNN(domain_name="ENZYMES", aggregation="coo",
                               axis_name="data")
        _, eval_dp = make_gc_steps_data_parallel(dp_model, cfg, optimizer,
                                                 labels, dp_mesh)
        store = GraphStore.load(tmp / "ENZYMES.npz")
        stacked = build_sharded_gc_batches(store, "val", 32, N_DEV)
        dp_loss = float(eval_dp(state, stacked[0])[0])
        np.testing.assert_allclose(dp_loss, ref_loss, rtol=2e-4)
