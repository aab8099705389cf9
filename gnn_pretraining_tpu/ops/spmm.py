"""GIN neighborhood aggregation: ``z = A @ h + (1 + eps) * h``.

This is the hot op of every forward/backward in the framework — the TPU-native
replacement for PyG's ``GINConv`` scatter-add CUDA kernels (reference:
src/models/gnn.py:29-37, where ``GINConv`` computes
``MLP((1+eps)·x_i + Σ_{j∈N(i)} x_j)``).

Design: the graphs in this workload are small (≤3.3k nodes full-batch, ≤1k
nodes per molecule batch), so the neighbor sum maps best onto the MXU as a
dense adjacency matmul rather than a gather/scatter loop, which TPUs execute
poorly. Three interchangeable paths:

  * ``gin_aggregate_coo``   — XLA ``segment_sum`` over the COO edge list
                              (reference semantics; used for cross-checking and
                              for edge-partitioned multi-chip execution).
  * ``gin_aggregate_dense`` — ``A @ h`` with XLA's native matmul.
  * ``spmm_pallas``         — tiled Pallas MXU kernel computing
                              ``A @ h + (1+eps) h`` in one pass with a custom
                              VJP (bwd: ``Aᵀ @ g + (1+eps) g``).

The adjacency is built once per batch by a cheap scatter
(``build_dense_adjacency``) and reused by all 5 GIN layers and every task
forward in the step.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_dense_adjacency(senders: jnp.ndarray, receivers: jnp.ndarray,
                          edge_mask: jnp.ndarray, num_nodes: int,
                          dtype=jnp.float32) -> jnp.ndarray:
    """Dense [N, N] adjacency with A[dst, src] = multiplicity of edge src->dst.

    Message flow matches PyG's source_to_target: the aggregation at node ``i``
    sums features of senders ``j`` over edges ``j -> i``, i.e. ``(A @ h)[i]``.
    Masked (padding) edges contribute 0. ``dtype=bfloat16`` is exact (entries
    are small edge multiplicities) and halves the kernel's HBM traffic —
    build it once per batch and reuse across layers/forwards.
    """
    a = jnp.zeros((num_nodes, num_nodes), dtype=jnp.float32)
    a = a.at[receivers, senders].add(edge_mask.astype(jnp.float32))
    return a.astype(dtype)


def gin_aggregate_coo(h: jnp.ndarray, senders: jnp.ndarray, receivers: jnp.ndarray,
                      edge_mask: jnp.ndarray, eps: jnp.ndarray,
                      edge_axis: str | None = None) -> jnp.ndarray:
    """Reference-semantics aggregation via gather + masked segment_sum.

    With ``edge_axis`` (inside shard_map with the edge list sharded over that
    mesh axis), each device computes a partial aggregation over its local
    edges and the partials are psum-combined — the edge-partitioned execution
    of parallel/edge_partition.py, available to the full model.
    """
    msgs = h[senders] * edge_mask.astype(h.dtype)[:, None]
    agg = jax.ops.segment_sum(msgs, receivers, num_segments=h.shape[0])
    if edge_axis is not None:
        agg = jax.lax.psum(agg, edge_axis)
    return agg + (1.0 + eps) * h


def gin_aggregate_dense(h: jnp.ndarray, adj: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """MXU path: ``A @ h + (1+eps) h`` with XLA's matmul (f32, parity)."""
    return jnp.dot(adj.astype(jnp.float32), h,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) + (1.0 + eps) * h


# ---------------------------------------------------------------------------
# Pallas tiled SpMM kernel
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spmm_kernel(eps_ref, a_ref, h_ref, hd_ref, out_ref, acc_ref, *,
                 mode: str, transpose_a: bool):
    """One (i, j, k) grid step of ``out = A @ H + (1+eps) H``.

    Grid is (M/bm, F/bn, N/bk) with k innermost; ``acc_ref`` is a VMEM f32
    accumulator carried across the k loop. ``hd_ref`` is the diagonal block of
    H (rows aligned with the out-rows of this i tile) used for the
    ``(1+eps) H`` epilogue.

    Precision modes (the adjacency is exact in bf16 — its entries are small
    edge multiplicities — so only H decides accuracy):
      * ``highest`` — f32 MXU passes (~1e-6, parity/testing);
      * ``split``   — H = hi + lo in bf16, two bf16 passes (~4e-5, default
        training mode, ~2.4× faster than highest);
      * ``bf16``    — one bf16 pass (~1e-2, throughput mode).

    ``transpose_a`` contracts over A's rows (``Aᵀ @ H``) for the backward
    pass without materializing a transposed adjacency.
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dims = (((0,), (0,)), ((), ())) if transpose_a else (((1,), (0,)), ((), ()))

    def mm(a, h):
        return jax.lax.dot_general(a, h, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    h = h_ref[:]
    if mode == "highest":
        a = a_ref[:].astype(jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            a, h.astype(jnp.float32), dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "split":
        a = a_ref[:].astype(jnp.bfloat16)
        hi = h.astype(jnp.bfloat16)
        lo = (h - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc_ref[:] += mm(a, hi) + mm(a, lo)
    else:  # bf16
        a = a_ref[:].astype(jnp.bfloat16)
        acc_ref[:] += mm(a, h.astype(jnp.bfloat16))

    @pl.when(k == nk - 1)
    def _epilogue():
        out_ref[:] = acc_ref[:] + (1.0 + eps_ref[0]) * hd_ref[:].astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "mode", "transpose_a"))
def _spmm_fwd_impl(adj: jnp.ndarray, h: jnp.ndarray, eps: jnp.ndarray,
                   bm: int | None = None, bn: int | None = None,
                   bk: int | None = None, mode: str = "split",
                   transpose_a: bool = False) -> jnp.ndarray:
    n0, f0 = h.shape
    # Defaults (explicit args win — scripts/tune_spmm.py scans alternatives):
    # single-pass K when the whole contraction fits comfortably in VMEM —
    # measured ~25% faster than accumulating over K tiles on v5e (no
    # accumulator read-modify-write, better pipelining). bm=256 over 128:
    # +8% (Cora 90.1 vs 83.2 Me/s) / +12% (ENZYMES batch) in the round-3
    # on-chip tile scan — fewer grid steps, same single-K pipelining.
    if bn is None:
        bn = 256
    if bm is None or bk is None:
        if n0 <= 4096:
            bm, bk = bm or 256, bk or _round_up(n0, 128)
        else:
            bm, bk = bm or 256, bk or 512
    # Every block dim must be a multiple of 128 (Mosaic requires the last two
    # block dims divisible by (8, 128); bm is the LAST dim of the transposed
    # A block), and bk a multiple of bm so the pad never exceeds one bk.
    bm = min(bm, _round_up(n0, 128))
    bk = _round_up(min(bk, _round_up(n0, 128)), bm)
    bn = min(bn, _round_up(f0, 128))

    # Zero-pad to tile multiples: exact for A@H + (1+eps)H, and keeps every
    # MXU tile fully populated.
    n = _round_up(n0, bk)
    f = _round_up(f0, bn)
    if (n, f) != (n0, f0):
        adj = jnp.pad(adj, ((0, n - n0), (0, n - n0)))
        h = jnp.pad(h, ((0, n - n0), (0, f - f0)))

    grid = (pl.cdiv(n, bm), pl.cdiv(f, bn), pl.cdiv(n, bk))
    eps_arr = jnp.asarray(eps, jnp.float32).reshape((1,))

    passes = {"highest": 6, "split": 2, "bf16": 1}[mode]
    flops = passes * n * n * f + 2 * n * f
    bytes_accessed = adj.dtype.itemsize * n * n + 4 * 2 * n * f

    if transpose_a:
        a_spec = pl.BlockSpec((bk, bm), lambda i, j, k: (k, i),
                              memory_space=pltpu.VMEM)
    else:
        a_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_spmm_kernel, mode=mode,
                               transpose_a=transpose_a)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, f), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                              # eps
            a_spec,                                                             # A tile
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),                              # H tile (k rows)
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),                              # H tile (out rows)
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        # CPU (tests / virtual meshes) runs the kernel in interpreter mode.
        interpret=jax.default_backend() != "tpu",
    )(eps_arr, adj, h, h)
    return out[:n0, :f0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_pallas(adj: jnp.ndarray, h: jnp.ndarray, eps: jnp.ndarray,
                mode: str = "split") -> jnp.ndarray:
    """``A @ h + (1+eps) h`` as a tiled Pallas MXU kernel with custom VJP.

    ``adj`` is treated as non-differentiable graph structure; gradients flow to
    ``h`` (``Aᵀ @ g + (1+eps) g``, computed by the same kernel with a
    transposed index map — no Aᵀ materialization) and to the learnable GIN
    ``eps`` (``Σ g ⊙ h``), matching the autodiff of the reference GINConv with
    ``train_eps=True`` (src/models/gnn.py:36). See ``_spmm_kernel`` for the
    precision modes; pass the adjacency pre-cast to bf16 for the full
    bandwidth win in ``split``/``bf16`` modes.
    """
    return _spmm_fwd_impl(adj, h, eps, mode=mode)


def _spmm_fwd(adj, h, eps, mode):
    return _spmm_fwd_impl(adj, h, eps, mode=mode), (adj, h, eps)


def _spmm_bwd(mode, residuals, g):
    adj, h, eps = residuals
    dh = _spmm_fwd_impl(adj, g, eps, mode=mode, transpose_a=True)
    deps = jnp.vdot(g, h)
    return None, dh, deps.astype(jnp.asarray(eps).dtype).reshape(jnp.shape(eps))


spmm_pallas.defvjp(_spmm_fwd, _spmm_bwd)


def gin_aggregate(h: jnp.ndarray, eps: jnp.ndarray, *,
                  adj: jnp.ndarray | None = None,
                  senders: jnp.ndarray | None = None,
                  receivers: jnp.ndarray | None = None,
                  edge_mask: jnp.ndarray | None = None,
                  bsr=None,
                  impl: str = "pallas") -> jnp.ndarray:
    """Dispatch between the aggregation implementations.

    Size dispatch: the dense-adjacency paths (``dense``/``pallas``) carry
    O(N²) HBM traffic — right for this workload's ≤3.3k-node graphs, wrong
    beyond ~8k nodes. For large graphs build a ``BlockCSR`` once per graph
    (host-side, ops/spmm_csr.build_block_csr) and pass it here (or pass
    ``impl="csr"``): O(nnzb·tile) traffic, still MXU tiles. ``coo`` is the
    XLA segment_sum fallback for structure with no tile locality.
    """
    if impl == "coo":
        return gin_aggregate_coo(h, senders, receivers, edge_mask, eps)
    if bsr is not None or impl == "csr":
        from gnn_pretraining_tpu.ops.spmm_csr import (
            build_block_csr,
            gin_aggregate_csr,
        )

        if bsr is None:
            bsr = build_block_csr(np.asarray(senders), np.asarray(receivers),
                                  np.asarray(edge_mask), h.shape[0])
        return gin_aggregate_csr(h, bsr, eps)
    if adj is None:
        from gnn_pretraining_tpu.config import DENSE_ADJACENCY_MAX_NODES

        if h.shape[0] > DENSE_ADJACENCY_MAX_NODES:
            raise ValueError(
                f"dense adjacency for {h.shape[0]} nodes would be "
                f"{h.shape[0]**2 * 2 / 2**20:.0f} MB; build a BlockCSR "
                "(ops/spmm_csr.build_block_csr) and pass bsr=, or use "
                "impl='coo'")
        adj = build_dense_adjacency(senders, receivers, edge_mask, h.shape[0])
    if impl == "dense":
        return gin_aggregate_dense(h, adj, eps)
    if impl == "pallas":
        return spmm_pallas(adj, h, eps)
    raise ValueError(f"unknown impl {impl!r}")
