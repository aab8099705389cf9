"""Measure — don't assert — where the Cora-shape SpMM iteration time goes
(VERDICT r3 #4).

The bench headline (91.4M edges/s, MFU 0.330) is 71% of the split-mode
compute roofline (128M). This script decomposes the measured fwd+bwd
iteration on the chip into additive parts, each slope-timed (difference of
two in-jit iteration counts, relay-jitter aware):

  harness   — the bench loop's own ops (grad-normalize + loss reduce)
  fwd       — one forward kernel call at the padded shape
  bwd_dh    — the transposed kernel call (Aᵀ@g)
  deps      — the VJP's ``vdot(g, h)`` epsilon gradient
  pad_macs  — extra MACs from N=2708 → 2816 tile padding (8.1% of SoL)

plus two controls: the same iteration at N=2816 (zero padding relative to
its own size) and N=2560 (a smaller exact multiple) to test whether per-MAC
efficiency is scale-invariant. Output: analysis/results/spmm_profile.json +
a table for docs/KERNELS.md.

Run on the chip (TPU backend required):
  python scripts/profile_spmm.py
"""

from __future__ import annotations

import json
import sys
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gnn_pretraining_tpu.utils import runtime  # noqa: E402

runtime.fail_fast_backend_init()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gnn_pretraining_tpu.ops.spmm import (  # noqa: E402
    build_dense_adjacency,
    spmm_pallas,
)
from gnn_pretraining_tpu.utils.profiling import slope_time  # noqa: E402

V5E_BF16_PEAK = 197e12
HBM_GBS = 819e9
E_CORA = 10556
OUT = REPO / "analysis" / "results" / "spmm_profile.json"


def make_inputs(n, f=256, e=E_CORA, seed=0):
    rng = np.random.default_rng(seed)
    senders = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    adj = build_dense_adjacency(senders, receivers, jnp.ones(e, jnp.float32),
                                n, dtype=jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    return adj, h


def norm(x):
    return x / (1e-6 + jnp.max(jnp.abs(x)))


def t_iteration(adj, h, eps, what: str) -> float:
    """Slope-time one loop-iteration variant. All variants keep a
    loop-carried dependency through the measured op so XLA cannot hoist it."""

    if what == "fwd_bwd":      # the bench's iteration, verbatim semantics
        def body(i, x):
            g = jax.grad(lambda xx: jnp.sum(
                spmm_pallas(adj, xx, eps, "split") ** 2))(x)
            return norm(g)
    elif what == "fwd":        # forward kernel + the same harness ops
        def body(i, x):
            y = spmm_pallas(adj, x, eps, "split")
            return norm(y + jnp.sum(y ** 2))
    elif what == "harness":    # harness ops alone (no kernel)
        def body(i, x):
            return norm(x + jnp.sum(x ** 2))
    elif what == "deps":       # the VJP's eps-gradient reduction alone
        def body(i, x):
            return norm(x + jnp.vdot(x, x))
    else:
        raise ValueError(what)

    @partial(jax.jit, static_argnames=("iters",))
    def run(a, x, iters):
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    return slope_time(lambda it: (lambda: float(run(adj, h, iters=it))))


def main() -> None:
    assert jax.default_backend() == "tpu", "profile on the chip"
    eps = jnp.float32(0.1)
    f = 256
    report = {"edges": E_CORA, "f": f, "sol_us_n2816": None, "shapes": {}}

    for n in (2708, 2816, 2560):
        adj, h = make_inputs(n)
        res = {}
        for what in ("fwd_bwd", "fwd", "harness", "deps"):
            res[what + "_us"] = round(t_iteration(adj, h, eps, what) * 1e6, 2)
            print(f"n={n} {what}: {res[what + '_us']:.2f} us", flush=True)
        n_pad = ((n + 127) // 128) * 128
        # split mode: 2 bf16 MXU passes per matmul, fwd + bwd(dh)
        sol = 2 * (2 * 2 * n_pad * n_pad * f) / V5E_BF16_PEAK
        res["n_pad"] = n_pad
        res["sol_padded_us"] = round(sol * 1e6, 2)
        res["kernel_us"] = round(res["fwd_bwd_us"] - res["harness_us"], 2)
        res["mxu_efficiency"] = round(res["sol_padded_us"]
                                      / max(res["kernel_us"], 1e-9), 3)
        res["edges_per_sec"] = round(E_CORA / (res["fwd_bwd_us"] * 1e-6), 0)
        report["shapes"][str(n)] = res

    # The headline decomposition at the Cora shape.
    c = report["shapes"]["2708"]
    sol_exact = 2 * (2 * 2 * 2708 * 2708 * f) / V5E_BF16_PEAK * 1e6
    fwd_kernel = c["fwd_us"] - c["harness_us"]
    bwd_kernel = c["kernel_us"] - fwd_kernel
    report["breakdown_us"] = {
        "total_iteration": c["fwd_bwd_us"],
        "harness_ops": c["harness_us"],
        "fwd_kernel": round(fwd_kernel, 2),
        "bwd_kernel_incl_deps": round(bwd_kernel, 2),
        "deps_alone": c["deps_us"],
        "sol_exact_macs": round(sol_exact, 2),
        "sol_padded_macs": c["sol_padded_us"],
        "padding_macs_cost": round(c["sol_padded_us"] - sol_exact, 2),
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report["breakdown_us"], indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
