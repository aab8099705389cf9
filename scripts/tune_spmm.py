"""SpMM tile-size scan on the real chip.

Times ``_spmm_fwd_impl`` fwd+bwd across block-shape candidates on the bench
shapes (Cora N=2708 F=256; ENZYMES batch N=2048) to pick the defaults baked
into ops/spmm.py (currently: single-pass K with bm=128 below N<=4096).
Timing uses utils/profiling.slope_time so relay fixed costs cancel.

Run (background; each compile ~20-40s through the relay):
    python scripts/tune_spmm.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gnn_pretraining_tpu.ops.spmm import _spmm_fwd_impl, build_dense_adjacency
    from gnn_pretraining_tpu.utils.profiling import slope_time
    from gnn_pretraining_tpu.utils.runtime import setup_jax

    setup_jax()
    print("backend:", jax.default_backend(), flush=True)

    for n, e, label in ((2708, 10556, "cora"), (2048, 3968, "enzymes")):
        f = 256
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.integers(0, n, e), jnp.int32)
        r = jnp.asarray(rng.integers(0, n, e), jnp.int32)
        adj = build_dense_adjacency(s, r, jnp.ones(e, jnp.float32), n,
                                    dtype=jnp.bfloat16)
        h = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
        eps = jnp.float32(0.1)

        nk = ((n + 127) // 128) * 128
        candidates = []
        for bm in (128, 256, 512):
            candidates.append((bm, 256, nk))          # single K pass
        candidates += [(128, 256, 512), (256, 256, 512), (256, 128, nk),
                       (512, 128, nk)]

        print(f"--- {label} (N={n}, F={f}) ---", flush=True)
        for bm, bn, bk in candidates:
            @functools.partial(jax.jit, static_argnames=("iters",))
            def run(a, x, iters, bm=bm, bn=bn, bk=bk):
                # One fwd + one transposed pass per iteration — exactly what
                # spmm_pallas's custom VJP executes. jax.grad is NOT used:
                # _spmm_fwd_impl is the raw pallas_call (no custom_vjp), and
                # Pallas AD of the accumulator kernel fails on chip.
                def fwd_bwd(xx):
                    out = _spmm_fwd_impl(a, xx, eps, bm=bm, bn=bn, bk=bk,
                                         mode="split")
                    g = _spmm_fwd_impl(a, out, eps, bm=bm, bn=bn, bk=bk,
                                       mode="split", transpose_a=True)
                    return g / (1e-6 + jnp.max(jnp.abs(g)))

                return jnp.sum(jax.lax.fori_loop(
                    0, iters, lambda i, acc: fwd_bwd(acc), x))

            try:
                t0 = time.time()
                t = slope_time(lambda it: (lambda: run(adj, h, iters=it)))
                flops = 2 * 2 * n * n * f
                print(f"bm={bm:4d} bn={bn:4d} bk={bk:5d}: {t*1e6:8.1f} us "
                      f"{e/t/1e6:7.1f} Me/s mfu={flops/t/197e12:.3f} "
                      f"(compile {time.time()-t0:.0f}s)", flush=True)
            except Exception as ex:  # noqa: BLE001 — report and keep scanning
                print(f"bm={bm:4d} bn={bn:4d} bk={bk:5d}: FAIL "
                      f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)


if __name__ == "__main__":
    main()
