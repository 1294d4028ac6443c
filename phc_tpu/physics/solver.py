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
