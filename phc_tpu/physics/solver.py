"""Batched SPD solvers tuned for TPU.

XLA's native batched `cholesky` lowers to a column-sequential algorithm
with dynamic slicing that runs at VPU latency, not MXU throughput — on a
(4096, 75, 75) batch it costs ~40 ms per solve (measured on v5e; 64
solves = 2.5 s of the reference-scale train step, scripts/bench_profile.py).
These implementations restate the factorization as a handful of large
batched matmuls (recursive Schur-complement block inversion), which is how
the MXU wants it: O(log n) levels, each a few (B, k, k) GEMMs.

`spd_solve` is the production entry point used by the physics engine.
Accuracy is validated against the MuJoCo-checked Cholesky path in
tests/test_solver.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# bf16_3x (~1e-6 rel) — the iterative-refinement step in spd_solve wipes
# out the residual difference vs full fp32 while halving MXU passes.
_PREC = jax.lax.Precision.HIGH


def _cholesky_unrolled(A):
    """Trace-time-unrolled right-looking Cholesky for small static n."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[..., j:, j] - jnp.einsum(
            "...ik,...k->...i", L[..., j:, :j], L[..., j, :j], precision=_PREC
        )
        d = jnp.sqrt(jnp.maximum(s[..., 0], 1e-12))
        L = L.at[..., j:, j].set(s / d[..., None])
    return L


def _lower_tri_inverse_unrolled(L):
    """Unrolled forward substitution for the inverse of lower-triangular L:
    row i of X = (e_i - L[i, :i] X[:i]) / L[i, i] — n static steps, each a
    batched vector-matrix product."""
    n = L.shape[-1]
    inv_d = 1.0 / jnp.diagonal(L, axis1=-2, axis2=-1)  # (..., n)
    eye = jnp.eye(n, dtype=L.dtype)
    rows = [jnp.broadcast_to(eye[0], L.shape[:-2] + (n,)) * inv_d[..., 0, None]]
    for i in range(1, n):
        prev = jnp.stack(rows, axis=-2)  # (..., i, n)
        s = eye[i] - jnp.einsum(
            "...k,...kn->...n", L[..., i, :i], prev, precision=_PREC
        )
        rows.append(s * inv_d[..., i, None])
    return jnp.stack(rows, axis=-2)


def _spd_inverse_base(A):
    """Base case: explicit inverse via unrolled Cholesky, A = L L^T,
    A^-1 = L^-T L^-1."""
    L = _cholesky_unrolled(A)
    Li = _lower_tri_inverse_unrolled(L)
    return jnp.einsum("...ki,...kj->...ij", Li, Li, precision=_PREC)


def spd_inverse(A, base: int = 16):
    """Inverse of a batched SPD matrix by recursive Schur-complement
    2x2-block inversion — O(log n) levels of batched GEMMs (MXU) instead of
    O(n) sequential column steps (VPU).

      [A11 A12]^-1 = [ I11 + X iS X^T   -X iS ]   X  = A11^-1 A12
      [A21 A22]      [ -iS X^T            iS  ]   S  = A22 - A21 X
    """
    n = A.shape[-1]
    if n <= base:
        return _spd_inverse_base(A)
    k = n // 2
    A11 = A[..., :k, :k]
    A12 = A[..., :k, k:]
    A22 = A[..., k:, k:]
    i11 = spd_inverse(A11, base)
    X = jnp.einsum("...ij,...jk->...ik", i11, A12, precision=_PREC)
    S = A22 - jnp.einsum("...ji,...jk->...ik", A12, X, precision=_PREC)
    iS = spd_inverse(S, base)
    B12 = -jnp.einsum("...ij,...jk->...ik", X, iS, precision=_PREC)
    B11 = i11 - jnp.einsum("...ij,...kj->...ik", B12, X, precision=_PREC)
    top = jnp.concatenate([B11, B12], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(B12, -1, -2), iS], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_solve(A, b, base: int = 16, refine: int = 1):
    """Solve A x = b for batched SPD A (..., n, n), b (..., n).

    Explicit block inverse + matvec, with `refine` steps of iterative
    refinement (r = b - A x; x += A^-1 r) to pull the residual down to
    direct-solve accuracy. Cost is a handful of batched GEMMs — ~30x faster
    than XLA's batched cholesky+cho_solve at (4096, 75, 75) on v5e.
    """
    Ainv = spd_inverse(A, base)
    x = jnp.einsum("...ij,...j->...i", Ainv, b, precision=_PREC)
    for _ in range(refine):
        r = b - jnp.einsum("...ij,...j->...i", A, x, precision=_PREC)
        x = x + jnp.einsum("...ij,...j->...i", Ainv, r, precision=_PREC)
    return x


# ---------------------------------------------------------------------------
# Pallas batched Cholesky solve in env-minor ("lanes") layout.
#
# Why: XLA's batched small-matrix ops at (4096, 75, 75) pad BOTH per-env
# dims to the 128-lane tile, so even one GEMM or matvec costs ~5 ms of
# HBM traffic (measured on v5e) and spd_solve lands at ~12 ms. Putting the
# BATCH in lanes instead (matrix dims in sublanes / the looped dim) makes
# every per-env column op a dense (n, 128) VPU tile with zero padding
# waste: the whole factor+solve touches A once (~92 MB at 4096 envs).
# This is the TPU-native layout for per-env small-matrix physics.
# ---------------------------------------------------------------------------

from functools import partial


def _chol_factor_lanes_kernel(a_ref, L_ref):
    """Factor-only variant of _chol_solve_lanes_kernel: writes L to HBM so
    several right-hand sides can be solved against one factorization
    (frozen-substep physics solves the same LHS `substeps` times)."""
    NP = a_ref.shape[0]
    lanes = a_ref.shape[2]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, lanes), 0)
    L_ref[:] = a_ref[:]
    for j in range(NP):
        colj = L_ref[j]
        dinv = jax.lax.rsqrt(jnp.maximum(colj[j : j + 1, :], 1e-12))
        Lj = jnp.where(row_ids >= j, colj * dinv, 0.0)
        L_ref[j] = Lj
        if j + 1 < NP:
            scale = Lj[j + 1 :, :]
            L_ref[j + 1 :] = L_ref[j + 1 :] - Lj[None, :, :] * scale[:, None, :]


def _chol_resolve_lanes_kernel(L_ref, b_ref, x_ref, y_ref, y2_ref):
    """Substitution-only variant: L y = b then L^T x = y."""
    NP = L_ref.shape[0]
    y_ref[:] = b_ref[:]
    for j in range(NP):
        Lj = L_ref[j]
        yj = y_ref[j : j + 1, :] / Lj[j : j + 1, :]
        y2_ref[j : j + 1, :] = yj
        y_ref[:] = y_ref[:] - Lj * yj
    x_ref[:] = jnp.zeros_like(x_ref)
    for j in range(NP - 1, -1, -1):
        Lj = L_ref[j]
        s = jnp.sum(Lj * x_ref[:], axis=0, keepdims=True)
        x_ref[j : j + 1, :] = (y2_ref[j : j + 1, :] - s) / Lj[j : j + 1, :]


def _pad_lanes(A, b, n, NP, B, Bp):
    At = A.transpose(2, 1, 0)  # (col, row, env)
    bt = b.T if b is not None else None
    if NP != n:
        At = jnp.pad(At, ((0, NP - n), (0, NP - n), (0, 0)))
        ii = np.arange(n, NP)
        At = At.at[ii, ii, :].set(1.0)
        if bt is not None:
            bt = jnp.pad(bt, ((0, NP - n), (0, 0)))
    if Bp != B:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
        ii = np.arange(NP)
        At = At.at[ii, ii, B:].set(1.0)
        if bt is not None:
            bt = jnp.pad(bt, ((0, 0), (0, Bp - B)))
    return At, bt


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


@partial(jax.jit, static_argnames=("interpret",))
def chol_factor_lanes(A, interpret: bool | None = None):
    """Cholesky-factor batched SPD A (B, n, n) in the env-minor lanes
    layout. Returns the opaque padded factor Lt (NP, NP, Bp) for
    chol_resolve_lanes — factor once, substitute per right-hand side."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _auto_interpret(interpret)
    B, n = A.shape[0], A.shape[-1]
    NP = -(-n // 8) * 8
    LANES = 128
    Bp = -(-B // LANES) * LANES
    At, _ = _pad_lanes(A, None, n, NP, B, Bp)
    return pl.pallas_call(
        _chol_factor_lanes_kernel,
        out_shape=jax.ShapeDtypeStruct((NP, NP, Bp), At.dtype),
        grid=(Bp // LANES,),
        in_specs=[pl.BlockSpec((NP, NP, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NP, NP, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At)


@partial(jax.jit, static_argnames=("interpret",))
def chol_resolve_lanes(Lt, b, interpret: bool | None = None):
    """Solve L L^T x = b given Lt from chol_factor_lanes. b (B, n) -> x (B, n)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _auto_interpret(interpret)
    B, n = b.shape
    NP, _, Bp = Lt.shape
    bt = b.T
    if NP != n:
        bt = jnp.pad(bt, ((0, NP - n), (0, 0)))
    if Bp != B:
        bt = jnp.pad(bt, ((0, 0), (0, Bp - B)))
    xt = pl.pallas_call(
        _chol_resolve_lanes_kernel,
        out_shape=jax.ShapeDtypeStruct((NP, Bp), bt.dtype),
        grid=(Bp // 128,),
        in_specs=[
            pl.BlockSpec((NP, NP, 128), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NP, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NP, 128), bt.dtype),
            pltpu.VMEM((NP, 128), bt.dtype),
        ],
        interpret=interpret,
    )(Lt, bt)
    return xt[:n, :B].T


def _chol_solve_lanes_kernel(a_ref, b_ref, x_ref, L_ref, y_ref, y2_ref):
    """One batch tile: a_ref (NP, NP, 128) column-major per lane
    (a_ref[c, r, l] = A_l[r, c]), b_ref (NP, 128). Right-looking
    columnwise Cholesky entirely in VMEM, then forward/back substitution.
    All loops are static (NP is a compile-time constant)."""
    NP = a_ref.shape[0]
    lanes = a_ref.shape[2]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, lanes), 0)

    # ---- factor: L L^T = A (right-looking; pollution above each column's
    # diagonal is masked at column-creation time) ----
    L_ref[:] = a_ref[:]
    for j in range(NP):
        colj = L_ref[j]
        dinv = jax.lax.rsqrt(jnp.maximum(colj[j : j + 1, :], 1e-12))
        Lj = jnp.where(row_ids >= j, colj * dinv, 0.0)
        L_ref[j] = Lj
        if j + 1 < NP:
            scale = Lj[j + 1 :, :]  # rows k > j: L[k, j]
            L_ref[j + 1 :] = L_ref[j + 1 :] - Lj[None, :, :] * scale[:, None, :]

    # ---- forward substitution: L y = b ----
    y_ref[:] = b_ref[:]
    for j in range(NP):
        Lj = L_ref[j]
        yj = y_ref[j : j + 1, :] / Lj[j : j + 1, :]
        y2_ref[j : j + 1, :] = yj
        # rows < j have Lj = 0 (untouched); row j becomes 0; rows > j updated
        y_ref[:] = y_ref[:] - Lj * yj

    # ---- back substitution: L^T x = y ----
    x_ref[:] = jnp.zeros_like(x_ref)
    for j in range(NP - 1, -1, -1):
        Lj = L_ref[j]
        # (L^T x)[j] = L[j,j] x[j] + sum_{k>j} L[k,j] x[k]; x[j] is still 0
        s = jnp.sum(Lj * x_ref[:], axis=0, keepdims=True)
        x_ref[j : j + 1, :] = (y2_ref[j : j + 1, :] - s) / Lj[j : j + 1, :]


@partial(jax.jit, static_argnames=("interpret",))
def chol_solve_lanes(A, b, interpret: bool | None = None):
    """Solve A x = b for batched SPD A (B, n, n), b (B, n) via the Pallas
    lanes kernel. Exact fp32 Cholesky (no refinement needed) — ~10x faster
    than spd_solve at (4096, 75, 75) on v5e because the batch rides the
    lane dimension (no 128-padding of the tiny per-env dims).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    B, n = b.shape
    NP = -(-n // 8) * 8
    LANES = 128
    Bp = -(-B // LANES) * LANES

    At = A.transpose(2, 1, 0)  # (col, row, env)
    bt = b.T  # (n, B)
    if NP != n:
        At = jnp.pad(At, ((0, NP - n), (0, NP - n), (0, 0)))
        ii = np.arange(n, NP)
        At = At.at[ii, ii, :].set(1.0)  # unit diagonal on padded rows
        bt = jnp.pad(bt, ((0, NP - n), (0, 0)))
    if Bp != B:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
        ii = np.arange(NP)
        At = At.at[ii, ii, B:].set(1.0)  # identity on padded envs
        bt = jnp.pad(bt, ((0, 0), (0, Bp - B)))

    xt = pl.pallas_call(
        _chol_solve_lanes_kernel,
        out_shape=jax.ShapeDtypeStruct((NP, Bp), At.dtype),
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((NP, NP, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NP, NP, LANES), At.dtype),
            pltpu.VMEM((NP, LANES), At.dtype),
            pltpu.VMEM((NP, LANES), At.dtype),
        ],
        interpret=interpret,
    )(At, bt)
    return xt[:n, :B].T
