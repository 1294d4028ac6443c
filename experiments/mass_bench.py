"""Micro-benchmark of mass-matrix / bias assembly variants on the TPU.

Isolates the (B, N, N) CRBA assembly cost: gather-vs-reshape F build,
einsum-vs-broadcast-FMA M_full, and the composite-inertia einsum. Timing
uses the scalar-fetch sync protocol (axon: block_until_ready is a no-op).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache

setup_cache()

from phc_tpu.physics import engine as eng
from phc_tpu.physics.model import build_smpl_model

_PREC = jax.lax.Precision.HIGH

model = build_smpl_model()
B = 4096
state = eng.default_state(model, B)
key = jax.random.PRNGKey(0)
state = state._replace(
    vel=jax.random.normal(key, state.vel.shape) * 0.5,
    root_pos=state.root_pos + jax.random.normal(jax.random.PRNGKey(1), (B, 3)) * 0.1,
)

REP = 16


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    dt = float(np.median(ts)) / REP * 1000
    print(f"{name:44s} {dt:8.3f} ms/iter")
    return dt


def rep(body):
    """Run `body` REP times on perturbed states (prevents CSE/hoisting).

    Perturbs joint_quat as well as root_pos — perturbing position alone
    lets XLA hoist every rotation-dependent subexpression out of the
    repetition (first version of this bench under-reported by ~2x).
    """

    def f(st):
        acc = 0.0
        for i in range(REP):
            s2 = st._replace(
                root_pos=st.root_pos + i * 1e-6,
                joint_quat=st.joint_quat + i * 1e-7,
                vel=st.vel + i * 1e-7,
            )
            acc = acc + body(s2)
        return acc

    return jax.jit(f)


# shared pieces
def fk_S(st):
    frame = eng.forward_kinematics(model, st)
    S = eng._motion_subspace(model, frame)
    return frame, S


dof_body = eng._dof_body_ids(model)


def m_gather(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    Ic = eng._composite_inertia(model, I_sp)
    Ic_d = Ic[:, jnp.asarray(dof_body)]
    F = jnp.einsum("bnij,bnj->bni", Ic_d, S, precision=_PREC)
    M = jnp.einsum("bni,bmi->bnm", F, S, precision=_PREC)
    return M.sum()


def m_block_einsum(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    Ic = eng._composite_inertia(model, I_sp)
    Bn, N = S.shape[:2]
    Jb = Ic.shape[1]
    S_ball = S[:, 6:].reshape(Bn, Jb - 1, 3, 6)
    F_root = jnp.einsum("bxy,bny->bnx", Ic[:, 0], S[:, :6], precision=_PREC)
    F_ball = jnp.einsum("bjxy,bjdy->bjdx", Ic[:, 1:], S_ball, precision=_PREC)
    F = jnp.concatenate([F_root, F_ball.reshape(Bn, N - 6, 6)], axis=1)
    M = jnp.einsum("bni,bmi->bnm", F, S, precision=_PREC)
    return M.sum()


def m_block_fma(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    Ic = eng._composite_inertia(model, I_sp)
    Bn, N = S.shape[:2]
    Jb = Ic.shape[1]
    S_ball = S[:, 6:].reshape(Bn, Jb - 1, 3, 6)
    F_root = jnp.einsum("bxy,bny->bnx", Ic[:, 0], S[:, :6], precision=_PREC)
    F_ball = jnp.einsum("bjxy,bjdy->bjdx", Ic[:, 1:], S_ball, precision=_PREC)
    F = jnp.concatenate([F_root, F_ball.reshape(Bn, N - 6, 6)], axis=1)
    M = sum(F[:, :, None, i] * S[:, None, :, i] for i in range(6))
    return M.sum()


def m_gather_fma(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    Ic = eng._composite_inertia(model, I_sp)
    Ic_d = Ic[:, jnp.asarray(dof_body)]
    F = jnp.einsum("bnij,bnj->bni", Ic_d, S, precision=_PREC)
    M = sum(F[:, :, None, i] * S[:, None, :, i] for i in range(6))
    return M.sum()


def m_current(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    return eng._mass_matrix_from(model, I_sp, S).sum()


def bias_current(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    return eng._bias_from(model, frame, state, I_sp, S).sum()


def fk_only(st):
    frame, S = fk_S(st)
    return S.sum()


def isp_only(st):
    frame, S = fk_S(st)
    return eng._spatial_inertia_world(model, frame).sum() + S.sum()


def isp_comp(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    return eng._composite_inertia(model, I_sp).sum() + S.sum()


def bias_only_from(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    return I_sp.sum() * 0.0 + eng._bias_from(model, frame, st, I_sp, S).sum()


def mc_shared(st):
    frame, S = fk_S(st)
    I_sp = eng._spatial_inertia_world(model, frame)
    M = eng._mass_matrix_from(model, I_sp, S)
    C = eng._bias_from(model, frame, st, I_sp, S)
    return M.sum() + C.sum()


print("devices:", jax.devices(), flush=True)
timeit("fk+S only", rep(fk_only), state)
timeit("M: gather + einsum (original)", rep(m_gather), state)
timeit("M: block-reshape + einsum", rep(m_block_einsum), state)
timeit("M: block-reshape + FMA (current)", rep(m_block_fma), state)
timeit("M: gather + FMA", rep(m_gather_fma), state)
timeit("M: engine current", rep(m_current), state)
timeit("bias: engine current", rep(bias_current), state)
timeit("I_sp build only", rep(isp_only), state)
timeit("I_sp + composite", rep(isp_comp), state)
timeit("bias only (I_sp shared, not counted)", rep(bias_only_from), state)
timeit("M+C shared (frozen-step build)", rep(mc_shared), state)


def mc_comps(st):
    frame, _ = fk_S(st)
    Sc = eng._motion_subspace_comps(model, frame)
    params = eng._dyn_params(model, frame)
    M = eng._mass_matrix_comps(model, params, Sc)
    C = eng._bias_comps(model, frame, st, params, Sc)
    return M.sum() + C.sum()


def m_comps(st):
    frame, _ = fk_S(st)
    Sc = eng._motion_subspace_comps(model, frame)
    params = eng._dyn_params(model, frame)
    return eng._mass_matrix_comps(model, params, Sc).sum()


timeit("M: component form", rep(m_comps), state)
timeit("M+C component form (new frozen build)", rep(mc_comps), state)
