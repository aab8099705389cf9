"""Checkpoint serialization: best-model files and full in-run resume state."""

import pathlib
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnn_pretraining_tpu.pretrain.pretrain import TrainState
from gnn_pretraining_tpu.utils.checkpoint import (
    load_checkpoint,
    load_train_state,
    save_checkpoint,
    save_train_state,
)


def _tiny_state():
    params = {"gnn_backbone": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
              "heads_x": {"b": jnp.ones(3)}}
    stats = {"gnn_backbone": {"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}}}
    opt = optax.adamw(1e-3)
    return TrainState(params=params, batch_stats=stats,
                      opt_state=opt.init(params), opt_step=jnp.int32(7),
                      balancer_step=jnp.int32(3)), opt


class TestCheckpoint:
    def test_model_checkpoint_roundtrip(self):
        state, _ = _tiny_state()
        path = pathlib.Path(tempfile.mkdtemp()) / "m.msgpack"
        save_checkpoint(path, state.params, state.batch_stats, epoch=4,
                        val_metrics={"val/loss/total": 0.5})
        ckpt = load_checkpoint(path)
        np.testing.assert_array_equal(
            np.asarray(ckpt["params"]["gnn_backbone"]["w"]),
            np.asarray(state.params["gnn_backbone"]["w"]))
        assert ckpt["meta"]["epoch"] == 4
        assert ckpt["meta"]["val_metrics"]["val/loss/total"] == 0.5

    def test_train_state_resume_roundtrip(self):
        state, opt = _tiny_state()
        # advance the optimizer once so opt_state is nontrivial
        grads = jax.tree.map(jnp.ones_like, state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(params=params, opt_state=opt_state)

        path = pathlib.Path(tempfile.mkdtemp()) / "resume.msgpack"
        save_train_state(path, state, epoch=9, best_total=0.25,
                         epochs_since_improvement=2)

        template, _ = _tiny_state()
        restored, counters = load_train_state(path, template)
        assert counters["epoch"] == 9
        assert counters["best_total"] == 0.25
        assert counters["epochs_since_improvement"] == 2
        assert int(restored.opt_step) == 7
        assert int(restored.balancer_step) == 3
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(restored.opt_state),
                        jax.tree.leaves(state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
