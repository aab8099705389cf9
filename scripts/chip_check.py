"""On-chip validation target (VERDICT r1 next-round #7).

The CPU Pallas interpreter does not enforce Mosaic constraints, so kernel
edits that pass the CPU test suite can still fail or miscompute on real
hardware. This script runs the kernel parity checks and one jitted train
step per task family ON THE CHIP and exits non-zero on any failure:

  1. Pallas SpMM (all 3 precision modes) fwd+bwd vs the XLA dense path.
  2. Fused Pallas NT-Xent fwd+bwd vs the XLA formula.
  3. Two-stage exact top-k vs flat lax.top_k.
  4. One pretrain multi-task chunk step (s5: 5 tasks + PCGrad + balancer).
  5. One fine-tune train step per task type (GC / NC / LP).
  6. A tpu+cpu serving artifact (jax.export) replays on the chip and matches
     a direct apply (bf16-tolerant).

Run (background — first compiles take minutes through the relay):
    python scripts/chip_check.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

FAILURES = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"  ok   {name} ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report every failure, then exit 1
        FAILURES.append(name)
        print(f"  FAIL {name}: {type(e).__name__}: {e}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from gnn_pretraining_tpu.utils.runtime import (
        acquire_chip,
        fail_fast_backend_init,
        setup_jax,
    )

    setup_jax()
    # The TPU is exclusive; ask a recorded background sweep to yield at its
    # next chunk boundary (hard reclaim only as a timeout fallback).
    acquire_chip()
    fail_fast_backend_init()
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — this defeats the point of chip_check")

    # -- 1. SpMM parity ----------------------------------------------------
    def spmm_parity():
        from gnn_pretraining_tpu.ops.spmm import (
            build_dense_adjacency,
            gin_aggregate_dense,
            spmm_pallas,
        )

        rng = np.random.default_rng(0)
        n, e, f = 2708, 10556, 256
        s = jnp.asarray(rng.integers(0, n, e), jnp.int32)
        r = jnp.asarray(rng.integers(0, n, e), jnp.int32)
        m = jnp.asarray((rng.random(e) < 0.9).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
        eps = jnp.float32(0.1)
        adj = build_dense_adjacency(s, r, m, n, dtype=jnp.float32)
        adj_bf = adj.astype(jnp.bfloat16)

        @jax.jit
        def ref(x):
            return jax.value_and_grad(
                lambda xx: jnp.sum(gin_aggregate_dense(xx, adj, eps) ** 2))(x)

        ref_l, ref_g = jax.device_get(ref(h))
        for mode, a, tol in (("highest", adj, 1e-5), ("split", adj_bf, 1e-3)):
            @jax.jit
            def got(x, a=a, mode=mode):
                return jax.value_and_grad(
                    lambda xx: jnp.sum(spmm_pallas(a, xx, eps, mode) ** 2))(x)

            got_l, got_g = jax.device_get(got(h))
            np.testing.assert_allclose(got_l, ref_l, rtol=tol)
            denom = np.maximum(np.abs(ref_g), 1.0)
            assert np.max(np.abs(got_g - ref_g) / denom) < tol, mode

        # bf16 mode is checked against the *same-precision* XLA formula: the
        # kernel must be exact at its own arithmetic (measured bit-exact on
        # v5e), while vs f32 the error tail of chained bf16 matmuls is
        # unbounded in max-norm (p99 ~3e-2, max ~1e-1 on this shape).
        @jax.jit
        def ref_bf(x):
            def f(xx):
                agg = jnp.dot(adj_bf, xx.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                return jnp.sum(((1.0 + eps) * xx + agg) ** 2)
            return jax.value_and_grad(f)(x)

        @jax.jit
        def got_bf(x):
            return jax.value_and_grad(
                lambda xx: jnp.sum(spmm_pallas(adj_bf, xx, eps, "bf16") ** 2))(x)

        rb_l, rb_g = jax.device_get(ref_bf(h))
        gb_l, gb_g = jax.device_get(got_bf(h))
        np.testing.assert_allclose(gb_l, rb_l, rtol=1e-6)
        denom = np.maximum(np.abs(rb_g), 1.0)
        assert np.max(np.abs(gb_g - rb_g) / denom) < 1e-5, "bf16"

    check("spmm fwd+bwd parity (highest/split/bf16)", spmm_parity)

    # -- 2. NT-Xent parity -------------------------------------------------
    def ntxent_parity():
        from gnn_pretraining_tpu.ops.ntxent_pallas import nt_xent_pallas
        from gnn_pretraining_tpu.ops.sddmm import nt_xent_loss

        rng = np.random.default_rng(1)
        rows, d = 1024, 128
        z1 = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
        z2 = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
        valid = jnp.asarray((rng.random(rows) < 0.8).astype(np.float32))
        temp = jnp.float32(0.3)

        def scalar(fn):
            def inner(a, b):
                s, nrows = fn(a, b, temp, valid)
                return s / jnp.maximum(nrows, 1.0)

            return jax.jit(jax.value_and_grad(inner, argnums=(0, 1)))

        ref_l, (rg1, rg2) = jax.device_get(scalar(nt_xent_loss)(z1, z2))
        got_l, (gg1, gg2) = jax.device_get(scalar(nt_xent_pallas)(z1, z2))
        np.testing.assert_allclose(got_l, ref_l, rtol=1e-4)
        np.testing.assert_allclose(gg1, rg1, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(gg2, rg2, rtol=1e-3, atol=1e-5)

    check("ntxent fused fwd+bwd parity", ntxent_parity)

    # -- 2b. fused NT-Xent at the large regime -------------------------------
    def ntxent_large():
        """n=8192 is the size whose VMEM OOM was VERDICT r2 weak #1; the
        retiled (flash-softmax) kernel must compile AND match on chip."""
        from gnn_pretraining_tpu.ops.ntxent_pallas import nt_xent_pallas
        from gnn_pretraining_tpu.ops.sddmm import nt_xent_loss

        rng = np.random.default_rng(7)
        rows, d = 8192, 128
        z1 = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
        z2 = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
        valid = jnp.asarray((rng.random(rows) < 0.9).astype(np.float32))
        temp = jnp.float32(0.3)

        def scalar(fn):
            def inner(a, b):
                s, nrows = fn(a, b, temp, valid)
                return s / jnp.maximum(nrows, 1.0)

            return jax.jit(jax.value_and_grad(inner, argnums=(0, 1)))

        ref_l, (rg1, rg2) = jax.device_get(scalar(nt_xent_loss)(z1, z2))
        got_l, (gg1, gg2) = jax.device_get(scalar(nt_xent_pallas)(z1, z2))
        np.testing.assert_allclose(got_l, ref_l, rtol=1e-4)
        np.testing.assert_allclose(gg1, rg1, rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(gg2, rg2, rtol=2e-3, atol=1e-5)

    check("ntxent fused n=8192 (retiled) parity", ntxent_large)

    # -- 2c. block-CSR sparse SpMM ------------------------------------------
    def spmm_csr_parity():
        from gnn_pretraining_tpu.ops.spmm import gin_aggregate_coo
        from gnn_pretraining_tpu.ops.spmm_csr import (
            build_block_csr,
            gin_aggregate_csr,
            synthetic_banded_edges,
        )

        rng = np.random.default_rng(8)
        n, e, band = 16384, 16384 * 8, 512
        senders, receivers = synthetic_banded_edges(n, e, band, rng)
        mask = np.ones(e, np.float32)
        h = jnp.asarray(rng.normal(size=(n, 256)), jnp.float32)
        eps = jnp.float32(0.13)
        s_d, r_d, m_d = map(jnp.asarray, (senders, receivers, mask))

        def f_coo(x):
            return jnp.mean(gin_aggregate_coo(x, s_d, r_d, m_d, eps) ** 2)

        ref_l, ref_g = jax.device_get(
            jax.jit(jax.value_and_grad(f_coo))(h))
        for mode, rtol in (("highest", 1e-4), ("split", 1e-3)):
            bsr = build_block_csr(
                senders, receivers, mask, n,
                dtype=np.float32 if mode == "highest" else jnp.bfloat16)

            def f_csr(x, b, mode=mode):
                return jnp.mean(gin_aggregate_csr(x, b, eps, mode) ** 2)

            # bsr as a jit argument, not a closure: the f32 'highest' blocks
            # are large and closures ship with the remote-compiled executable
            got_l, got_g = jax.device_get(
                jax.jit(jax.value_and_grad(f_csr))(h, bsr))
            np.testing.assert_allclose(got_l, ref_l, rtol=rtol,
                                       err_msg=f"csr {mode} loss")
            np.testing.assert_allclose(got_g, ref_g, rtol=rtol, atol=1e-4,
                                       err_msg=f"csr {mode} grad")

    check("block-CSR SpMM n=16384 parity (highest+split)", spmm_csr_parity)

    # -- 3. exact top-k ----------------------------------------------------
    def topk_parity():
        from gnn_pretraining_tpu.ops.topk import exact_top_k

        rng = np.random.default_rng(2)
        v = jnp.asarray(rng.normal(size=(3328 * 3328,)), jnp.float32)
        ref_v, ref_i = jax.device_get(jax.lax.top_k(v, 256))
        got_v, got_i = jax.device_get(exact_top_k(v, 256))
        np.testing.assert_allclose(got_v, ref_v)
        assert set(got_i.tolist()) == set(ref_i.tolist())

    check("two-stage exact top-k == flat", topk_parity)

    # -- 3b. streaming miner -----------------------------------------------
    def streaming_miner_parity():
        from gnn_pretraining_tpu.finetune.mining import (
            build_forbidden_mask,
            mine_hard_negatives_streaming,
        )

        rng = np.random.default_rng(3)
        n = 8192
        emb = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)
        forbidden = build_forbidden_mask(n, rng.integers(0, n, size=(2, 20000)))
        key = jax.random.PRNGKey(5)
        outs = [jax.device_get(mine_hard_negatives_streaming(
                    emb, forbidden, key, num_negatives=1024, num_hard=512,
                    row_block=rb)) for rb in (512, 2048)]
        hard = [set(zip(s[:512].tolist(), r[:512].tolist())) for s, r in outs]
        assert hard[0] == hard[1], "hard set differs across row blocks"
        fb = np.asarray(jax.device_get(forbidden))
        for s, r in outs:
            assert not fb[s, r].any()
            assert len(set(zip(s.tolist(), r.tolist()))) == 1024

    check("streaming miner block-size invariance + validity", streaming_miner_parity)

    # -- 4. pretrain chunk step (s5) ---------------------------------------
    def pretrain_step():
        from gnn_pretraining_tpu import config
        from gnn_pretraining_tpu.data.loaders import (
            create_pretrain_train_loader,
        )
        from gnn_pretraining_tpu.pretrain.optimizers import (
            create_task_specific_optimizer,
        )
        from gnn_pretraining_tpu.pretrain.pretrain import (
            TrainState,
            init_model,
            make_chunked_train_step,
            stack_batches,
        )

        cfg = config.PretrainConfig(exp_name="s5", seed=42)
        loader = create_pretrain_train_loader(cfg.pretrain_domains,
                                              np.random.default_rng(0))
        sample = loader.sample_step()
        model, variables = init_model(cfg, sample, "pallas")
        opt = create_task_specific_optimizer(variables["params"],
                                             cfg.active_tasks)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=opt.init(variables["params"]),
                           opt_step=jnp.int32(0), balancer_step=jnp.int32(0))
        chunk_fn, names = make_chunked_train_step(model, cfg, opt, 100)
        stacked = jax.device_put(stack_batches([sample, sample]))
        state, _, packed = chunk_fn(jax.device_put(state), stacked,
                                    jax.random.PRNGKey(0))
        vals = dict(zip(names, jax.device_get(packed)))
        total = vals["train/loss/total"]
        assert np.all(np.isfinite(total)), total

    check("pretrain s5 chunk step (5 tasks + PCGrad)", pretrain_step)

    # -- 5. fine-tune steps ------------------------------------------------
    def finetune_steps():
        from gnn_pretraining_tpu import config
        from gnn_pretraining_tpu.finetune.finetune import finetune

        for domain in ("ENZYMES", "Cora_NC", "CiteSeer_LP"):
            cfg = config.FinetuneConfig(domain_name=domain,
                                        finetune_strategy="full_finetune",
                                        pretrained_scheme="b1", seed=42)
            out = finetune(cfg, aggregation="pallas", epochs=1,
                           use_wandb=False, out_root="/tmp/chip_check_out")
            loss_keys = [k for k in out if "loss" in k]
            assert loss_keys and all(np.isfinite(out[k]) for k in loss_keys), out

    check("finetune one epoch per task type (GC/NC/LP)", finetune_steps)

    # -- 6. serving artifact executes on the chip ---------------------------
    def serving_artifact():
        import jax.numpy as jnp

        from gnn_pretraining_tpu import config, serving
        from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN

        rng = np.random.default_rng(0)
        n, e = 256, 512
        model = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
        ex = {
            "x": rng.normal(size=(n, config.DOMAIN_DIMENSIONS["Cora_NC"])
                            ).astype(np.float32),
            "node_mask": np.ones(n, np.float32),
            "senders": rng.integers(0, n, e).astype(np.int32),
            "receivers": rng.integers(0, n, e).astype(np.int32),
            "edge_mask": np.ones(e, np.float32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(ex["x"]), jnp.asarray(ex["node_mask"]), False,
            senders=jnp.asarray(ex["senders"]),
            receivers=jnp.asarray(ex["receivers"]),
            edge_mask=jnp.asarray(ex["edge_mask"]))
        ref = model.apply({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                          jnp.asarray(ex["x"]), jnp.asarray(ex["node_mask"]),
                          False, senders=jnp.asarray(ex["senders"]),
                          receivers=jnp.asarray(ex["receivers"]),
                          edge_mask=jnp.asarray(ex["edge_mask"]))
        blob = serving.export_serving(model, variables, ex,
                                      platforms=("tpu", "cpu"))
        served = serving.load_serving(blob)
        out = served(*(jnp.asarray(ex[k]) for k in
                       ("x", "node_mask", "senders", "receivers",
                        "edge_mask")))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)  # chip matmuls: bf16

    check("serving artifact (tpu+cpu lowering) replays on chip",
          serving_artifact)

    if FAILURES:
        print(f"\nCHIP CHECK FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("\nCHIP CHECK OK", flush=True)


if __name__ == "__main__":
    main()
