"""SPD solver: recursive Schur block inverse vs LAPACK-class oracles.

The physics engine's one-solve-per-substep (engine.py) runs through
`spd_solve`; these tests pin its accuracy on matrices harder-conditioned
than the real contact LHS (condition up to ~1e5 vs ~1e3-1e4 in sim).
"""

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.physics.solver import (
    _cholesky_unrolled,
    _lower_tri_inverse_unrolled,
    spd_inverse,
    spd_solve,
)


def _spd_batch(B=64, n=75, span=(-2, 3), seed=0):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(B, n, n))
    Q, _ = np.linalg.qr(G)
    lam = 10 ** rng.uniform(*span, size=(B, n))
    A = np.einsum("bij,bj,bkj->bik", Q, lam, Q)
    return A, rng.normal(size=(B, n))


def test_cholesky_unrolled():
    A, _ = _spd_batch(B=8, n=24, span=(-1, 2))
    L = np.asarray(_cholesky_unrolled(jnp.asarray(A, jnp.float32)))
    rec = np.einsum("bik,bjk->bij", L, L)
    assert np.abs(rec - A).max() / np.abs(A).max() < 1e-5
    assert np.allclose(np.triu(L, 1), 0.0)


def test_lower_tri_inverse_unrolled():
    A, _ = _spd_batch(B=8, n=16, span=(-1, 2))
    L = np.asarray(_cholesky_unrolled(jnp.asarray(A, jnp.float32)))
    Li = np.asarray(_lower_tri_inverse_unrolled(jnp.asarray(L)))
    err = np.abs(np.einsum("bik,bkj->bij", Li, L) - np.eye(16)).max()
    assert err < 1e-4, err


def test_spd_inverse():
    A, _ = _spd_batch(B=16, n=75, span=(-1, 2))
    Ai = np.asarray(jax.jit(spd_inverse)(jnp.asarray(A, jnp.float32))).astype(np.float64)
    err = np.abs(np.einsum("bik,bkj->bij", Ai, A) - np.eye(75)).max()
    assert err < 5e-3, err


def test_spd_solve_matches_direct():
    A, b = _spd_batch(B=64, n=75, span=(-2, 3))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    x = np.asarray(
        jax.jit(lambda A, b: spd_solve(A, b, base=24, refine=2))(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
    ).astype(np.float64)
    rel = np.linalg.norm(x - x_ref, axis=-1) / np.linalg.norm(x_ref, axis=-1)
    assert rel.max() < 5e-3, rel.max()
    assert np.median(rel) < 5e-4, np.median(rel)


def test_spd_solve_odd_sizes():
    """Recursion must handle any n, not just the humanoid's 75."""
    for n in (5, 17, 33, 50):
        A, b = _spd_batch(B=4, n=n, span=(-1, 1), seed=n)
        x_ref = np.linalg.solve(A, b[..., None])[..., 0]
        x = np.asarray(
            spd_solve(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32))
        ).astype(np.float64)
        rel = np.linalg.norm(x - x_ref, axis=-1) / np.linalg.norm(x_ref, axis=-1)
        assert rel.max() < 1e-3, (n, rel.max())


def test_chol_solve_lanes_matches_oracle():
    """Pallas lanes kernel (interpret mode on CPU) vs numpy direct solve,
    with both matrix-dim and batch-dim padding exercised."""
    from phc_tpu.physics.solver import chol_solve_lanes

    for B, n, seed in ((5, 12, 0), (3, 33, 1)):
        A, b = _spd_batch(B=B, n=n, span=(-1, 2), seed=seed)
        x_ref = np.linalg.solve(A, b[..., None])[..., 0]
        x = np.asarray(
            chol_solve_lanes(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32))
        )
        rel = np.linalg.norm(x - x_ref, axis=-1) / np.linalg.norm(x_ref, axis=-1)
        assert rel.max() < 2e-3, rel


def test_chol_factor_resolve_matches_fused():
    """Factor-once / substitute-per-rhs split (frozen-substep path) must
    agree with the fused chol_solve_lanes and the numpy oracle, including
    a second rhs against the same factor."""
    from phc_tpu.physics.solver import (
        chol_factor_lanes,
        chol_resolve_lanes,
        chol_solve_lanes,
    )

    for B, n, seed in ((5, 12, 2), (3, 75, 3)):
        A, b = _spd_batch(B=B, n=n, span=(-1, 2), seed=seed)
        b2 = b[::-1].copy()
        Aj = jnp.asarray(A, jnp.float32)
        Lt = chol_factor_lanes(Aj)
        for rhs in (b, b2):
            rj = jnp.asarray(rhs, jnp.float32)
            x_split = np.asarray(chol_resolve_lanes(Lt, rj))
            x_fused = np.asarray(chol_solve_lanes(Aj, rj))
            x_ref = np.linalg.solve(A, rhs[..., None])[..., 0]
            np.testing.assert_allclose(x_split, x_fused, atol=1e-5)
            rel = np.linalg.norm(x_split - x_ref, axis=-1) / np.linalg.norm(x_ref, axis=-1)
            assert rel.max() < 2e-3, rel
