"""Block-CSR sparse GIN aggregation for large graphs (VERDICT r2 weak #5).

The dense-adjacency Pallas SpMM (ops/spmm.py) is the right call for this
workload's ≤3.3k-node graphs, but its HBM traffic grows as N² — at 10× the
node count the flagship kernel is unusable. This module adds the scalable
path: the adjacency is stored as the set of nonzero (bm × bk) tiles
("block CSR": dense tile values + tile coordinates, sorted by tile row), and
a Pallas kernel with scalar-prefetched coordinates streams exactly those
tiles through the MXU:

    grid = (F/bn, nnzb); for a fixed feature tile j, the inner dimension
    walks the nonzero tiles t in row order, accumulating
    ``acc += T_t @ H[col_t]`` in VMEM and flushing
    ``out[row_t] = acc + (1+eps) H[row_t]`` whenever the next tile starts a
    new tile-row. Rows with no neighbors get an all-zero pad tile so every
    output block is written.

HBM traffic is O(nnzb · bm · bk + N·F) instead of O(N²): for graphs with
locality (molecule batches are block-diagonal by construction; large sparse
graphs after an RCM-style bandwidth-reducing reorder) nnzb ≪ (N/bm)²,
while the MXU still sees dense tiles — no gather/scatter in the hot loop,
which TPUs execute poorly (the XLA ``segment_sum`` COO path keeps that role
for exotic structure; ``scripts/chip_check.py`` measures the crossover).

Reference semantics: PyG GINConv scatter-add (src/models/gnn.py:29-37),
``z = A @ h + (1 + eps) h`` with A[dst, src] = edge multiplicity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["vals", "rows", "cols",
                                "vals_t", "rows_t", "cols_t"],
                   meta_fields=["num_nodes", "bm", "bk"])
@dataclasses.dataclass(frozen=True)
class BlockCSR:
    """Nonzero adjacency tiles, sorted by tile row; built once per graph.

    ``vals[t]`` is the dense (bm, bk) tile at tile coordinates
    (``rows[t]``, ``cols[t]``) of A (A[dst, src] = multiplicity). Pad slots
    repeat the last row with all-zero values (harmless accumulation). The
    transposed tiles drive the backward pass ``Aᵀ @ g`` without a transposed
    gather in the kernel.
    """

    vals: jnp.ndarray       # [nnzb, bm, bk]
    rows: jnp.ndarray       # [nnzb] i32, non-decreasing
    cols: jnp.ndarray       # [nnzb] i32
    vals_t: jnp.ndarray     # [nnzb_t, bk, bm] tiles of Aᵀ
    rows_t: jnp.ndarray     # [nnzb_t] i32
    cols_t: jnp.ndarray     # [nnzb_t] i32
    num_nodes: int
    bm: int
    bk: int

    @property
    def nnzb(self) -> int:
        return int(self.vals.shape[0])


def _build_one(dst: np.ndarray, src: np.ndarray, w: np.ndarray, n_pad: int,
               bm: int, bk: int, dtype) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Dense tiles of the (n_pad × n_pad) matrix with entries w at (dst, src),
    one tile per nonzero (bm × bk) grid cell PLUS a zero tile for every empty
    tile-row (so the kernel writes every output block)."""
    rb, cb = dst // bm, src // bk
    n_rows = n_pad // bm
    key = rb.astype(np.int64) * (n_pad // bk) + cb
    uniq, inv = np.unique(key, return_inverse=True)
    rows = (uniq // (n_pad // bk)).astype(np.int32)
    cols = (uniq % (n_pad // bk)).astype(np.int32)
    vals = np.zeros((len(uniq), bm, bk), np.float32)
    np.add.at(vals, (inv, dst % bm, src % bk), w)

    empty = np.setdiff1d(np.arange(n_rows, dtype=np.int32), rows)
    if len(empty):
        rows = np.concatenate([rows, empty])
        cols = np.concatenate([cols, np.zeros(len(empty), np.int32)])
        vals = np.concatenate(
            [vals, np.zeros((len(empty), bm, bk), np.float32)])
    order = np.argsort(rows, kind="stable")
    return vals[order].astype(dtype), rows[order], cols[order]


def build_block_csr(senders: np.ndarray, receivers: np.ndarray,
                    edge_mask: np.ndarray, num_nodes: int,
                    bm: int = 128, bk: int = 128,
                    dtype=np.float32, pad_to: int | None = None) -> BlockCSR:
    """Host-side (numpy) BSR builder; run once per graph, outside jit.

    ``pad_to`` fixes the tile-count so differently-sparse graphs of the same
    size can share one compiled kernel (pad tiles repeat the last row with
    zero values).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    w = np.asarray(edge_mask, np.float32)
    keep = w != 0
    src, dst, w = senders[keep], receivers[keep], w[keep]
    n_pad = _round_up(num_nodes, max(bm, bk))

    vals, rows, cols = _build_one(dst, src, w, n_pad, bm, bk, dtype)
    vals_t, rows_t, cols_t = _build_one(src, dst, w, n_pad, bk, bm, dtype)

    def pad(v, r, c):
        if pad_to is None or len(r) >= pad_to:
            return v, r, c
        extra = pad_to - len(r)
        return (np.concatenate([v, np.zeros((extra,) + v.shape[1:],
                                            v.dtype)]),
                np.concatenate([r, np.full(extra, r[-1], np.int32)]),
                np.concatenate([c, np.zeros(extra, np.int32)]))

    vals, rows, cols = pad(vals, rows, cols)
    vals_t, rows_t, cols_t = pad(vals_t, rows_t, cols_t)
    return BlockCSR(vals=jnp.asarray(vals), rows=jnp.asarray(rows),
                    cols=jnp.asarray(cols), vals_t=jnp.asarray(vals_t),
                    rows_t=jnp.asarray(rows_t), cols_t=jnp.asarray(cols_t),
                    num_nodes=num_nodes, bm=bm, bk=bk)


def _csr_kernel(rows_ref, cols_ref, eps_ref, vals_ref, h_ref, hd_ref,
                out_ref, acc_ref, *, mode: str):
    """One (j, t) grid step: accumulate tile t into its row's accumulator,
    flushing ``acc + (1+eps) H[row]`` when the tile-row changes."""
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    prev = rows_ref[jnp.maximum(t - 1, 0)]
    first = (t == 0) | (rows_ref[t] != prev)

    @pl.when(first)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = h_ref[:]
    tile = vals_ref[0]

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    if mode == "highest":
        acc_ref[:] += jax.lax.dot_general(
            tile.astype(jnp.float32), h.astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "split":
        a = tile.astype(jnp.bfloat16)
        hi = h.astype(jnp.bfloat16)
        lo = (h - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc_ref[:] += mm(a, hi) + mm(a, lo)
    else:  # bf16
        acc_ref[:] += mm(tile.astype(jnp.bfloat16), h.astype(jnp.bfloat16))

    nxt = rows_ref[jnp.minimum(t + 1, nt - 1)]
    last = (t == nt - 1) | (nxt != rows_ref[t])

    @pl.when(last)
    def _flush():
        out_ref[:] = acc_ref[:] + (1.0 + eps_ref[0]) * hd_ref[:].astype(
            jnp.float32)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "num_nodes", "bn",
                                             "mode"))
def _csr_matvec(vals, rows, cols, h, eps, *, bm: int, bk: int,
                num_nodes: int, bn: int = 256, mode: str = "split"):
    n0, f0 = h.shape
    n_pad = _round_up(num_nodes, max(bm, bk))
    bn = min(bn, _round_up(f0, 128))
    f = _round_up(f0, bn)
    hp = jnp.pad(h, ((0, n_pad - n0), (0, f - f0)))
    eps_arr = jnp.asarray(eps, jnp.float32).reshape((1,))
    nnzb = vals.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows, cols
        grid=(f // bn, nnzb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # eps
            pl.BlockSpec((1, bm, bk), lambda j, t, rows, cols: (t, 0, 0)),
            pl.BlockSpec((bk, bn), lambda j, t, rows, cols: (cols[t], j)),
            pl.BlockSpec((bm, bn), lambda j, t, rows, cols: (rows[t], j)),
        ],
        out_specs=pl.BlockSpec((bm, bn),
                               lambda j, t, rows, cols: (rows[t], j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_csr_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnzb * bm * bk * f + 2 * n_pad * f,
            bytes_accessed=(vals.dtype.itemsize * nnzb * bm * bk
                            + 4 * 3 * n_pad * f),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(rows, cols, eps_arr, vals, hp, hp)
    return out[:n0, :f0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_csr(bsr: BlockCSR, h: jnp.ndarray, mode: str, eps: jnp.ndarray
             ) -> jnp.ndarray:
    """``A @ h + (1+eps) h`` over block-CSR tiles; gradients flow to ``h``
    (``Aᵀ @ g + (1+eps) g`` via the prebuilt transposed tiles) and ``eps``
    (``Σ g ⊙ h``), like ops/spmm.spmm_pallas."""
    return _csr_matvec(bsr.vals, bsr.rows, bsr.cols, h, eps,
                       bm=bsr.bm, bk=bsr.bk, num_nodes=bsr.num_nodes,
                       mode=mode)


def _csr_fwd(bsr, h, mode, eps):
    return spmm_csr(bsr, h, mode, eps), (bsr, h, eps)


def _csr_bwd(mode, res, g):
    bsr, h, eps = res
    dh = _csr_matvec(bsr.vals_t, bsr.rows_t, bsr.cols_t, g, eps,
                     bm=bsr.bk, bk=bsr.bm, num_nodes=bsr.num_nodes,
                     mode=mode)
    deps = jnp.vdot(g, h)
    dbsr = jax.tree.map(jnp.zeros_like, bsr)  # structure, not differentiable
    return dbsr, dh, deps.astype(jnp.asarray(eps).dtype).reshape(
        jnp.shape(eps))


spmm_csr.defvjp(_csr_fwd, _csr_bwd)


def gin_aggregate_csr(h: jnp.ndarray, bsr: BlockCSR, eps: jnp.ndarray,
                      mode: str = "split") -> jnp.ndarray:
    return spmm_csr(bsr, h, mode, eps)


def synthetic_banded_edges(n: int, e: int, band: int,
                           rng: np.random.Generator
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic edge list with banded locality (as after an RCM reorder):
    receiver offsets are geometric with mean ≈ band/4 in either direction.
    Shared by bench.py, scripts/chip_check.py and scripts/crossover_scan.py
    so their numbers describe the same regime."""
    senders = rng.integers(0, n, e).astype(np.int32)
    delta = rng.geometric(4.0 / band, e) * rng.choice([-1, 1], e)
    receivers = np.clip(senders + delta, 0, n - 1).astype(np.int32)
    return senders, receivers


def rcm_order(senders: np.ndarray, receivers: np.ndarray,
              num_nodes: int) -> np.ndarray:
    """Reverse Cuthill–McKee permutation: relabel nodes so edges concentrate
    near the diagonal, which is exactly the locality that keeps the nonzero
    tile count small. Returns ``perm`` with ``perm[new_id] = old_id``; apply
    with ``inv = argsort(perm); senders2 = inv[senders]`` and permute the
    feature rows the same way. Host-side, once per graph."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = sp.csr_matrix(
        (np.ones(len(senders), np.float32),
         (np.asarray(senders), np.asarray(receivers))),
        shape=(num_nodes, num_nodes))
    return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=False),
                      dtype=np.int64)


# ---------------------------------------------------------------------------
# Multi-chip: tile-partitioned aggregation
# ---------------------------------------------------------------------------

def shard_block_csr(bsr: BlockCSR, n_shards: int) -> BlockCSR:
    """Repack a BlockCSR so its tiles split evenly over ``n_shards`` devices.

    Real tiles are dealt round-robin into shards (balances row runs); each
    shard additionally gets a zero pad tile for EVERY tile row (so its
    kernel writes every output block, like the single-device builder), is
    re-sorted by tile row, and is padded to the common per-shard length.
    Each shard's kernel output is then ``A_s @ h + (1+eps) h`` — a valid
    partial whose epilogue is replicated — and ``csr_aggregate_sharded``
    combines them as ``psum(partial) − (n_shards − 1)·(1+eps)·h``.
    """
    import numpy as np_

    n_pad = _round_up(bsr.num_nodes, max(bsr.bm, bsr.bk))
    n_rows = n_pad // bsr.bm

    vals = np_.asarray(bsr.vals)
    rows = np_.asarray(bsr.rows)
    cols = np_.asarray(bsr.cols)
    # drop single-device pad tiles (all-zero); identified by zero values
    real = np_.abs(vals).sum(axis=(1, 2)) > 0
    shards = [[] for _ in range(n_shards)]
    for i, t in enumerate(np_.nonzero(real)[0]):
        shards[i % n_shards].append(int(t))

    per = max((max(len(s) for s in shards) if any(shards) else 0) + n_rows, 1)
    out_v, out_r, out_c = [], [], []
    for s in shards:
        r_s = np_.concatenate([rows[s], np_.arange(n_rows, dtype=np_.int32)])
        c_s = np_.concatenate([cols[s], np_.zeros(n_rows, np_.int32)])
        v_s = np_.concatenate([vals[s],
                               np_.zeros((n_rows,) + vals.shape[1:],
                                         vals.dtype)])
        order = np_.argsort(r_s, kind="stable")
        r_s, c_s, v_s = r_s[order], c_s[order], v_s[order]
        extra = per - len(r_s)
        if extra > 0:
            r_s = np_.concatenate([r_s, np_.full(extra, r_s[-1], np_.int32)])
            c_s = np_.concatenate([c_s, np_.zeros(extra, np_.int32)])
            v_s = np_.concatenate([v_s, np_.zeros((extra,) + v_s.shape[1:],
                                                  v_s.dtype)])
        out_v.append(v_s)
        out_r.append(r_s)
        out_c.append(c_s)
    return dataclasses.replace(
        bsr, vals=jnp.asarray(np_.concatenate(out_v)),
        rows=jnp.asarray(np_.concatenate(out_r)),
        cols=jnp.asarray(np_.concatenate(out_c)))


def csr_aggregate_sharded(mesh, bsr_sharded: BlockCSR, h: jnp.ndarray,
                          eps, axis: str = "edge",
                          mode: str = "split") -> jnp.ndarray:
    """``A @ h + (1+eps) h`` with the adjacency tiles sharded over ``axis``:
    each device runs the block-CSR kernel on its tile slice (every device
    writes every output block — see shard_block_csr), partials are
    psum-combined, and the replicated ``(1+eps) h`` epilogue is corrected to
    count once. h is replicated; tile traffic is 1/n per device and rides
    ICI only once per layer (one psum)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    eps_arr = jnp.asarray(eps, jnp.float32)

    def local(vals, rows, cols, hh):
        part = _csr_matvec(vals[0], rows[0], cols[0], hh, eps_arr,
                           bm=bsr_sharded.bm, bk=bsr_sharded.bk,
                           num_nodes=bsr_sharded.num_nodes, mode=mode)
        total = jax.lax.psum(part, axis)
        return total - (n_dev - 1) * (1.0 + eps_arr) * hh

    per = bsr_sharded.vals.shape[0] // n_dev
    vals = bsr_sharded.vals.reshape((n_dev, per) + bsr_sharded.vals.shape[1:])
    rows = bsr_sharded.rows.reshape(n_dev, per)
    cols = bsr_sharded.cols.reshape(n_dev, per)
    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P(axis), P(axis), P()),
                     out_specs=P(), check_vma=False)(vals, rows, cols, h)
