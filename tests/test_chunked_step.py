"""Scan-fused chunked pretrain step == unfused per-step dispatch.

The chunked runner (pretrain.make_chunked_train_step) exists purely to
amortize relay dispatch; it must be numerically identical to the split-jit
path for the same sampled batch sequence and the same initial PRNG key.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data import setup as data_setup
from gnn_pretraining_tpu.data.loaders import create_pretrain_train_loader
from gnn_pretraining_tpu.pretrain.optimizers import (
    create_task_specific_optimizer,
)
from gnn_pretraining_tpu.pretrain.pretrain import (
    TrainState,
    init_model,
    make_chunked_train_step,
    make_train_step,
    stack_batches,
)


@pytest.fixture(scope="module")
def processed_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunked")
    data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                    synthetic_scale=0.06)
    return tmp


@pytest.mark.parametrize("scheme", ["b2", "s3"])
def test_chunked_matches_unfused(processed_dir, scheme):
    cfg = config.PretrainConfig(exp_name=scheme, seed=42)
    loader = create_pretrain_train_loader(cfg.pretrain_domains,
                                          np.random.default_rng(0),
                                          processed_dir=processed_dir)
    batches = [loader.sample_step() for _ in range(4)]

    def fresh_state():
        model, variables = init_model(cfg, batches[0], "dense")
        opt = create_task_specific_optimizer(variables["params"],
                                             cfg.active_tasks)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=opt.init(variables["params"]),
                           opt_step=jnp.int32(0),
                           balancer_step=jnp.int32(0))
        return model, opt, state

    total_steps = 4

    model, opt, state_a = fresh_state()
    step = make_train_step(model, cfg, opt, total_steps)
    key = jax.random.PRNGKey(cfg.seed)
    metrics_seq = []
    for b in batches:
        key, sub = jax.random.split(key)
        state_a, m = step(state_a, jax.device_put(b), sub)
        metrics_seq.append(jax.device_get(m))

    model, opt, state_b = fresh_state()
    chunk_fn, names = make_chunked_train_step(model, cfg, opt, total_steps)
    stacked = jax.device_put(stack_batches(batches))
    state_b, _, packed = chunk_fn(state_b, stacked,
                                  jax.random.PRNGKey(cfg.seed))
    metrics_b = dict(zip(names, jax.device_get(packed)))  # [M, chunk] rows

    # Same math, same key chain — but the fused scan is a differently-fused
    # XLA program, so float accumulation differs in the last ulps. PCGrad's
    # conflict decisions are sign tests on per-segment dot products; segments
    # whose dot is within rounding of zero may flip between the two programs
    # (even at step 0, where params are bit-identical, the task grads are
    # produced by different fusions), so the discrete conflict metrics get a
    # ~1% tolerance at step 0 and are skipped on later steps where rounding
    # feeds back through the params.
    for j, ma in enumerate(metrics_seq):
        for k, v in ma.items():
            if "conflict" in k or "projection" in k:
                if j == 0:
                    np.testing.assert_allclose(
                        np.asarray(metrics_b[k])[0], float(v), rtol=2e-2,
                        atol=1.5, err_msg=f"step 0: {k}")
                continue
            np.testing.assert_allclose(np.asarray(metrics_b[k])[j],
                                       float(v), rtol=5e-3, atol=1e-5,
                                       err_msg=f"step {j}: {k}")
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)
    assert int(state_b.opt_step) == total_steps
