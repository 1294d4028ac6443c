"""Microbench: SPD solve strategies at PHC scale (B=4096, n=75) on TPU.

Compares (per substep, i.e. per single solve, measured under a 64x scan):
  1. spd_solve (recursive Schur block inverse, current production path)
  2. chol_solve_lanes with batch-first input (includes the transpose cost)
  3. chol_solve_lanes fed batch-last directly (what a batch-last LHS
     assembly would provide)
  4. LHS assembly layouts: batch-first vs batch-last einsums for the
     contact rank-update M + dt * J diag(c) J^T.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.physics.solver import spd_solve, chol_solve_lanes
from phc_tpu.runtime.jax_setup import setup_cache

setup_cache()

B, n, A3 = 4096, 75, 192
rng = np.random.RandomState(0)
Jc = rng.randn(B, n, A3).astype(np.float32) * 0.1
M0 = rng.randn(n, 2 * n).astype(np.float32)
M0 = M0 @ M0.T / n + 10.0 * np.eye(n, dtype=np.float32)
coef = np.abs(rng.randn(B, A3)).astype(np.float32)
b = rng.randn(B, n).astype(np.float32)

Jc_d = jnp.asarray(Jc)
Jc_last = jnp.asarray(np.ascontiguousarray(Jc.transpose(1, 2, 0)))  # (n, 3A, B)
M0_d = jnp.asarray(M0)
coef_d = jnp.asarray(coef)
coef_last = jnp.asarray(np.ascontiguousarray(coef.T))  # (3A, B)
b_d = jnp.asarray(b)
b_last = jnp.asarray(np.ascontiguousarray(b.T))  # (n, B)


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{name:48s} {dt*1000:9.1f} ms  ({dt*1000/64:6.2f} ms/iter)", flush=True)
    return dt


def scan64(fn):
    """64 iterations; input perturbed per-iteration so nothing hoists."""

    def wrapped(*args):
        def body(c, _):
            out = fn(c, *args)
            return c + out * 1e-20 + 1.0, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=64)
        return out

    return jax.jit(wrapped)


# ---- 1. current: batch-first assembly + spd_solve -------------------------
def assemble_first(eps):
    lhs = M0_d[None] + eps * 1e-12 + jnp.einsum(
        "bnm,bm,bkm->bnk", Jc_d, coef_d, Jc_d, precision=jax.lax.Precision.HIGH
    )
    return lhs


def s1(eps):
    lhs = assemble_first(eps)
    return spd_solve(lhs, b_d, base=24, refine=2).sum()


timeit("assemble(bf) + spd_solve", scan64(lambda c: s1(c)))


# ---- 2. batch-first assembly + lanes cholesky (transpose inside) ----------
def s2(eps):
    lhs = assemble_first(eps)
    return chol_solve_lanes(lhs, b_d).sum()


timeit("assemble(bf) + chol_lanes (w/ transpose)", scan64(lambda c: s2(c)))


# ---- 3. batch-last assembly + lanes cholesky (no transpose) ----------------
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from phc_tpu.physics.solver import _chol_solve_lanes_kernel


@jax.jit
def chol_solve_lanes_bl(At, bt):
    """A in (col, row, B) batch-last layout, b in (n, B). No transposes."""
    n = bt.shape[0]
    Bb = bt.shape[1]
    NP = -(-n // 8) * 8
    LANES = 128
    if NP != n:
        At = jnp.pad(At, ((0, NP - n), (0, NP - n), (0, 0)))
        ii = np.arange(n, NP)
        At = At.at[ii, ii, :].set(1.0)
        bt = jnp.pad(bt, ((0, NP - n), (0, 0)))
    xt = pl.pallas_call(
        _chol_solve_lanes_kernel,
        out_shape=jax.ShapeDtypeStruct((NP, Bb), At.dtype),
        grid=(Bb // LANES,),
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
        interpret=jax.default_backend() == "cpu",
    )(At, bt)
    return xt[:n, :]


def assemble_last(eps):
    # lhs[c, r, b] = M0[r, c] + sum_m J[r, m, b] coef[m, b] J[c, m, b]
    Jw = Jc_last * coef_last[None]
    lhs = M0_d.T[:, :, None] + eps * 1e-12 + jnp.einsum(
        "rmb,cmb->crb", Jc_last, Jw, precision=jax.lax.Precision.HIGH
    )
    return lhs


def s3(eps):
    lhs = assemble_last(eps)
    return chol_solve_lanes_bl(lhs, b_last).sum()


timeit("assemble(bl) + chol_lanes (no transpose)", scan64(lambda c: s3(c)))


# ---- 4. assembly-only costs ------------------------------------------------
timeit("assembly only (batch-first einsum)", scan64(lambda c: assemble_first(c).sum()))
timeit("assembly only (batch-last einsum)", scan64(lambda c: assemble_last(c).sum()))

# ---- 5. solve-only costs ---------------------------------------------------
lhs_first = assemble_first(jnp.float32(0.0))
lhs_last = assemble_last(jnp.float32(0.0))
lhs_first = jax.block_until_ready(lhs_first)


def s5a(eps):
    return spd_solve(lhs_first + eps * 1e-12, b_d, base=24, refine=2).sum()


def s5b(eps):
    return chol_solve_lanes_bl(lhs_last + eps * 1e-12, b_last).sum()


timeit("solve only: spd_solve(bf)", scan64(s5a))
timeit("solve only: chol_lanes(bl)", scan64(s5b))

# accuracy cross-check
x1 = spd_solve(lhs_first, b_d, base=24, refine=2)
x2 = chol_solve_lanes_bl(lhs_last, b_last).T
err = float(jnp.max(jnp.abs(x1 - x2)) / (jnp.max(jnp.abs(x1)) + 1e-30))
print(f"rel max diff spd vs lanes: {err:.2e}")
