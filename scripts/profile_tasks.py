"""On-chip per-task pretrain step cost breakdown.

Times, for a given scheme, the marginal per-iteration cost of (a) each
task's loss+grad, (b) PCGrad combine, (c) the full fused step — using
slope_time so relay dispatch overhead cancels. Run: python
scripts/profile_tasks.py s1
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data.loaders import create_pretrain_train_loader
from gnn_pretraining_tpu.pretrain.optimizers import (
    create_task_specific_optimizer,
)
from gnn_pretraining_tpu.pretrain.pcgrad import apply_pcgrad
from gnn_pretraining_tpu.pretrain.pretrain import TrainState, init_model
from gnn_pretraining_tpu.pretrain.schedulers import temperature_at
from gnn_pretraining_tpu.pretrain.tasks import TaskContext, compute_task_loss
from gnn_pretraining_tpu.utils.profiling import slope_time
from gnn_pretraining_tpu.utils.runtime import setup_jax

setup_jax()
scheme = sys.argv[1] if len(sys.argv) > 1 else "s1"
cfg = config.PretrainConfig(exp_name=scheme, seed=42)
loader = create_pretrain_train_loader(cfg.pretrain_domains,
                                      np.random.default_rng(0))
sample = loader.sample_step()
model, variables = init_model(cfg, sample, "pallas")
params, stats = variables["params"], variables["batch_stats"]
batch_dev = jax.device_put(sample)
params = jax.device_put(params)
stats = jax.device_put(stats)
print("backend:", jax.default_backend(), "scheme:", scheme, flush=True)

ctx = TaskContext(temperature=temperature_at(jnp.int32(0), 100),
                  grl_lambda=jnp.float32(0.0), train=True)


def time_task(task):
    def make_run(iters):
        @jax.jit
        def run(p, s, b, key):
            def body(i, carry):
                acc, s2 = carry
                def loss_fn(pp, ss):
                    loss, _, ss2 = compute_task_loss(task, model, pp, ss, b,
                                                     jax.random.fold_in(key, i),
                                                     ctx)
                    return loss, ss2
                (loss, s3), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s2)
                leaf = jax.tree.leaves(g)[0]
                return acc + loss + leaf.sum(), s3
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0.0), s))
            return acc
        return lambda: run(params, stats, batch_dev, jax.random.PRNGKey(0))
    return slope_time(make_run, n1=5, n2=30, reps=2)


for task in cfg.active_tasks:
    t = time_task(task)
    print(f"  {task:18s}: {t*1e3:8.2f} ms/iter", flush=True)
