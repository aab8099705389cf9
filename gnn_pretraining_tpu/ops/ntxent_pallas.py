"""Fused NT-Xent as Pallas MXU kernels (the SDDMM-class kernel of this
workload: similarity + masking + softmax-CE in one pass, no [2N, 2N]
similarity matrix in HBM).

Forward: for row tile R of the stacked normalized projections
Ẑ = [ẑ1; ẑ2] ∈ R^{2N×D}, compute S_tile = Ẑ_tile Ẑᵀ/τ on the MXU with the
diagonal and invalid columns masked, then the per-row CE against the
positive at offset N — only per-row loss, max and denominator leave the
kernel.

Backward (analytic, also tiled): G = softmax(S) − onehot(label) for valid
rows; dL/dẐ = (G + Gᵀ)Ẑ/τ, recomputing S per tile from the saved softmax
stats; then the row-normalization VJP maps dẐ back to z1/z2.

Semantics match ops/sddmm.nt_xent_loss exactly (reference
src/pretrain/tasks.py:192-213); used when rows are TPU-tile sized, with the
XLA path as fallback and cross-check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASKED = -1e30
_NORM_EPS = 1e-12


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm_dtype():
    """Matmul operand dtype: bf16 on the chip (one MXU pass — the same
    single-pass numerics as the XLA path's default-precision matmul; a true
    f32 dot costs 3+ passes and made the kernel LOSE to XLA, 0.71x measured),
    f32 in CPU interpret mode where the XLA reference is full f32."""
    import jax as _jax

    return jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32


def _fwd_kernel(temp_ref, z_ref, zt_ref, valid_ref, loss_ref, mx_ref, den_ref,
                *, rows: int):
    """One row-tile: S = z_tile @ zᵀ/τ, masked; emit per-row loss/max/denom.

    Vector operands are laid out (1, rows) so the lane dimension carries the
    rows (Mosaic rejects blocked 1-D f32 operands)."""
    i = pl.program_id(0)
    r = z_ref.shape[0]
    n2 = zt_ref.shape[1]
    half = rows // 2

    mmt = _mm_dtype()
    s = jax.lax.dot_general(z_ref[:].astype(mmt), zt_ref[:].astype(mmt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / temp_ref[0]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, n2), 0) + i * r
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, n2), 1)
    col_valid = valid_ref[0, :].reshape(1, n2) > 0
    mask = (row_ids == col_ids) | ~col_valid
    s = jnp.where(mask, _MASKED, s)

    mx = jnp.max(s, axis=1)
    es = jnp.exp(s - mx[:, None])
    den = jnp.sum(es, axis=1)

    # positive at offset ±half
    labels = jnp.where(row_ids[:, 0] < half, row_ids[:, 0] + half,
                       row_ids[:, 0] - half)
    label_logit = jnp.sum(jnp.where(col_ids == labels[:, None], s, 0.0), axis=1)

    loss_ref[0, :] = jnp.log(den) + mx - label_logit
    mx_ref[0, :] = mx
    den_ref[0, :] = den


def _bwd_kernel(temp_ref, z_ref, zt_ref, valid_ref, mx_ref, den_ref, g_ref,
                dz_ref, acc_ref, *, rows: int):
    """dL/dẐ = (G + Gᵀ)Ẑ/τ, accumulated over row tiles.

    Grid dim 0 iterates the row tiles k; each step recomputes G_k (R×2N) and
    accumulates both G_k Ẑ (rows k of the output) and G_kᵀ Ẑ_k (all rows).
    ``g_ref`` carries the per-row upstream cotangent (0 for invalid rows).
    """
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    r = z_ref.shape[0]
    n2 = zt_ref.shape[1]
    half = rows // 2

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mmt = _mm_dtype()
    s = jax.lax.dot_general(z_ref[:].astype(mmt), zt_ref[:].astype(mmt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / temp_ref[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, n2), 0) + k * r
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, n2), 1)
    col_valid = valid_ref[0, :].reshape(1, n2) > 0
    mask = (row_ids == col_ids) | ~col_valid
    s = jnp.where(mask, _MASKED, s)

    p = jnp.exp(s - mx_ref[0, :][:, None]) / den_ref[0, :][:, None]
    labels = jnp.where(row_ids[:, 0] < half, row_ids[:, 0] + half,
                       row_ids[:, 0] - half)
    g_rows = g_ref[0, :]  # [r] upstream per-row cotangent (masked)
    grad_s = (p - (col_ids == labels[:, None]).astype(jnp.float32))
    grad_s = grad_s * g_rows[:, None] / temp_ref[0]

    # rows k of dZ get G_k @ Z  (Z = zt transposed: [n2, d] view of zt_ref.T)
    grad_s16 = grad_s.astype(mmt)
    gz = jax.lax.dot_general(grad_s16, zt_ref[:].astype(mmt),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [r, d]
    # all rows get G_kᵀ @ Z_k
    gtz = jax.lax.dot_general(grad_s16, z_ref[:].astype(mmt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [n2, d]

    acc_ref[:] += gtz
    acc_ref[pl.ds(k * r, r), :] += gz

    @pl.when(k == nk - 1)
    def _done():
        dz_ref[:] = acc_ref[:]


def _prep(z1, z2, valid):
    n, d = z1.shape
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    norm = jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), _NORM_EPS)
    zhat = z / norm
    vv = jnp.concatenate([valid, valid]).astype(jnp.float32)
    zhat = zhat * vv[:, None]  # zero invalid rows (their columns are masked anyway)
    return zhat, vv, norm


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _fwd_call(zhat, vv, temp, block_rows=256):
    rows, d = zhat.shape
    r = min(block_rows, _round_up(rows, 8))
    rows_p = _round_up(rows, r)
    d_p = _round_up(d, 128)
    zp = jnp.pad(zhat, ((0, rows_p - rows), (0, d_p - d)))
    vp = jnp.pad(vv, (0, rows_p - rows)).reshape(1, rows_p)
    grid = (rows_p // r,)
    temp_arr = jnp.asarray(temp, jnp.float32).reshape((1,))
    vec_spec = pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM)
    loss, mx, den = pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows),
        out_shape=(jax.ShapeDtypeStruct((1, rows_p), jnp.float32),
                   jax.ShapeDtypeStruct((1, rows_p), jnp.float32),
                   jax.ShapeDtypeStruct((1, rows_p), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((r, d_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_p, rows_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(vec_spec, vec_spec, vec_spec),
        interpret=jax.default_backend() != "tpu",
    )(temp_arr, zp, zp.T, vp)
    return loss[0, :rows], mx[0, :rows], den[0, :rows]


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _bwd_call(zhat, vv, temp, mx, den, g_rows, block_rows=256):
    rows, d = zhat.shape
    r = min(block_rows, _round_up(rows, 8))
    rows_p = _round_up(rows, r)
    d_p = _round_up(d, 128)
    zp = jnp.pad(zhat, ((0, rows_p - rows), (0, d_p - d)))
    vp = jnp.pad(vv, (0, rows_p - rows)).reshape(1, rows_p)
    mxp = jnp.pad(mx, (0, rows_p - rows), constant_values=0.0).reshape(1, rows_p)
    denp = jnp.pad(den, (0, rows_p - rows), constant_values=1.0).reshape(1, rows_p)
    gp = jnp.pad(g_rows, (0, rows_p - rows)).reshape(1, rows_p)
    temp_arr = jnp.asarray(temp, jnp.float32).reshape((1,))
    grid = (rows_p // r,)
    vec_tile = pl.BlockSpec((1, r), lambda k: (0, k), memory_space=pltpu.VMEM)
    dz = pl.pallas_call(
        functools.partial(_bwd_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct((rows_p, d_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((r, d_p), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_p, rows_p), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_p), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            vec_tile,
            vec_tile,
            vec_tile,
        ],
        out_specs=pl.BlockSpec((rows_p, d_p), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows_p, d_p), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(temp_arr, zp, zp.T, vp, mxp, denp, gp)
    return dz[:rows, :d]


@jax.custom_vjp
def nt_xent_pallas(z1: jnp.ndarray, z2: jnp.ndarray, temperature: jnp.ndarray,
                   valid: jnp.ndarray):
    """Fused NT-Xent; returns (loss_sum, num_rows) like sddmm.nt_xent_loss."""
    zhat, vv, _ = _prep(z1, z2, valid)
    loss, _, _ = _fwd_call(zhat, vv, temperature)
    return jnp.sum(loss * vv), jnp.sum(vv)


def _ntx_fwd(z1, z2, temperature, valid):
    zhat, vv, norm = _prep(z1, z2, valid)
    loss, mx, den = _fwd_call(zhat, vv, temperature)
    out = (jnp.sum(loss * vv), jnp.sum(vv))
    # zero-size dtype carriers: the bwd needs only shapes/dtypes of z1/z2,
    # not their values — saving the full arrays would hold 2 extra [N, D]
    # buffers live across fwd/bwd.
    dt1 = jnp.zeros((0,), z1.dtype)
    dt2 = jnp.zeros((0,), z2.dtype)
    return out, (dt1, dt2, temperature, zhat, vv, norm, mx, den)


def _ntx_bwd(res, cotangents):
    dt1, dt2, temperature, zhat, vv, norm, mx, den = res
    g_sum, _ = cotangents  # num_rows is integer-valued; no useful gradient
    g_rows = vv * g_sum
    dzhat = _bwd_call(zhat, vv, temperature, mx, den, g_rows)
    # VJP of row normalization ẑ = z/|z|. zhat (invalid rows zeroed) equals
    # z/|z| on every valid row, and dz is masked by vv below, so it can
    # stand in for the unmasked normalization — no recompute needed.
    # NOTE: the temperature cotangent is None — τ comes from a schedule, not
    # a parameter, and the caller (tasks._nt_xent) stops its gradient on the
    # XLA path too so both implementations agree.
    n = zhat.shape[0] // 2
    dz = (dzhat - zhat * jnp.sum(dzhat * zhat, axis=1, keepdims=True)) / norm
    dz = dz * vv[:, None]
    return dz[:n].astype(dt1.dtype), dz[n:].astype(dt2.dtype), None, None


nt_xent_pallas.defvjp(_ntx_fwd, _ntx_bwd)
