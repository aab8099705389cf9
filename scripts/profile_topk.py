"""Time top-k variants for LP hard-negative mining on the chip.

The miner needs top-256 of an 11M-element masked similarity vector
(N=3328 CiteSeer). Candidates:
  a) flat lax.top_k over N*N            (current, measured ~27 ms)
  b) two-stage exact: per-block top-k then top-k over block winners
  c) jax.lax.approx_max_k (TPU-native, approximate)

Run: python scripts/profile_topk.py [N] [K]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu.utils.profiling import slope_time
from gnn_pretraining_tpu.utils.runtime import setup_jax

setup_jax()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3328
K = int(sys.argv[2]) if len(sys.argv) > 2 else 256

rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.normal(size=(N * N,)), jnp.float32))
print("backend:", jax.default_backend(), "N:", N, "K:", K, flush=True)


def timeit(name, fn):
    def make_run(iters):
        @jax.jit
        def run(v):
            def body(i, acc):
                vals, idx = fn(v + acc * 1e-20)
                return acc + vals[0] + idx[0].astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return lambda: run(x)
    t = slope_time(make_run, n1=2, n2=10, reps=2)
    print(f"  {name:24s}: {t*1e3:8.2f} ms", flush=True)


def flat(v):
    return jax.lax.top_k(v, K)


def two_stage(v, blocks=128):
    b = v.reshape(blocks, -1)
    vals, idx = jax.lax.top_k(b, K)          # [blocks, K]
    off = jnp.arange(blocks, dtype=jnp.int32)[:, None] * b.shape[1]
    gvals, gidx = jax.lax.top_k(vals.reshape(-1), K)
    return gvals, (idx + off).reshape(-1)[gidx]


def approx(v):
    return jax.lax.approx_max_k(v, K)


def approx_rows(v, blocks=128):
    b = v.reshape(blocks, -1)
    vals, idx = jax.lax.approx_max_k(b, K)
    off = jnp.arange(blocks, dtype=jnp.int32)[:, None] * b.shape[1]
    gvals, gidx = jax.lax.top_k(vals.reshape(-1), K)
    return gvals, (idx + off).reshape(-1)[gidx]


timeit("flat top_k", flat)
for blk in (64, 128, 256, 832):
    if (N * N) % blk == 0:
        timeit(f"two-stage top_k b={blk}", lambda v, blk=blk: two_stage(v, blk))
timeit("approx_max_k", approx)
timeit("approx rows b=128", approx_rows)

# correctness: two-stage == flat (as sets)
v_ref, i_ref = jax.device_get(flat(x))
v_two, i_two = jax.device_get(two_stage(x))
assert np.allclose(np.sort(v_ref), np.sort(v_two)), "two-stage mismatch"
assert set(np.asarray(i_ref).tolist()) == set(np.asarray(i_two).tolist())
print("two-stage exactness OK", flush=True)
