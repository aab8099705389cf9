"""Time the fused pretrain chunk program: device time vs dispatch wall time.

Run: python scripts/profile_chunk.py s1 [chunk]
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
from gnn_pretraining_tpu.pretrain.pretrain import (
    TrainState,
    aot_compile_chunks,
    init_model,
    make_chunked_train_step,
    stack_batches,
)
from gnn_pretraining_tpu.utils.runtime import setup_jax

setup_jax()
scheme = sys.argv[1] if len(sys.argv) > 1 else "s1"
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 32
cfg = config.PretrainConfig(exp_name=scheme, seed=42)
loader = create_pretrain_train_loader(cfg.pretrain_domains,
                                      np.random.default_rng(0))
sample = loader.sample_step()
model, variables = init_model(cfg, sample, "pallas")
opt = create_task_specific_optimizer(variables["params"], cfg.active_tasks)
state = TrainState(params=variables["params"],
                   batch_stats=variables["batch_stats"],
                   opt_state=opt.init(variables["params"]),
                   opt_step=jnp.int32(0), balancer_step=jnp.int32(0))
state = jax.device_put(state)
chunk_fn, metric_names = make_chunked_train_step(model, cfg, opt,
                                                 total_steps=1000)
key = jax.device_put(jax.random.PRNGKey(0))

t0 = time.time()
compiled = aot_compile_chunks(chunk_fn, state, sample, [chunk], key)
print(f"compile: {time.time()-t0:.1f}s", flush=True)

buf = [loader.sample_step() for _ in range(chunk)]
stacked_host = stack_batches(buf)
nbytes = sum(a.nbytes for a in jax.tree.leaves(stacked_host))
print(f"chunk upload bytes: {nbytes/1e6:.2f} MB", flush=True)

t0 = time.time()
stacked = jax.device_put(stacked_host)
jax.block_until_ready(stacked)
t_up = time.time() - t0
print(f"upload time: {t_up:.3f}s", flush=True)

# warm
state, key, m = compiled[chunk](state, stacked, key)
jax.block_until_ready(m)

for rep in range(3):
    t0 = time.time()
    state, key, m = compiled[chunk](state, stacked, key)
    jax.block_until_ready(m)
    t_d = time.time() - t0
    print(f"dispatch+exec chunk({chunk}): {t_d:.3f}s "
          f"({t_d/chunk*1e3:.1f} ms/step)", flush=True)

# fetch cost
t0 = time.time()
_ = jax.device_get(m)
print(f"metrics fetch: {time.time()-t0:.3f}s", flush=True)
