"""Batched reduced-coordinate articulated rigid-body dynamics in JAX.

This is the TPU-native replacement for Isaac Gym / PhysX + gymtorch
(`/root/reference/puffer_phc/envs/isaacgym_env.py`, `gymtorch/`): the
simulator state lives in jnp arrays, the whole step is one fused XLA
program, and everything vmaps over the env batch.

Design (see SURVEY.md §7 phase 4):
  * Generalized coordinates: root position (world), root orientation quat,
    and one **ball joint with quaternion state** per non-root body. The
    reference approximates spherical joints with 3 stacked MJCF hinges and
    feeds exp-map coordinates into them interchangeably
    (`humanoid_phc.py:1216-1226`, `motion_lib.py:670-673`); we model true
    ball joints whose reported dof coordinates ARE the exp map, which
    matches the motion library convention exactly and has no gimbal issues.
  * Velocities: v = [root linear (world, 3), root angular (body frame, 3),
    per-joint relative angular velocity (child frame, 3 each)] — the MuJoCo
    free/ball-joint convention, so MuJoCo is a drop-in oracle for CRBA/RNEA.
  * Dynamics: world-frame Composite Rigid Body Algorithm for the joint-space
    mass matrix (one batched (B,N,6)x(B,6,N) matmul -> MXU) + world-frame
    RNEA for Coriolis/gravity bias, stable-PD actuation solved implicitly
    (LHS gets dt*Kd), and penalty ground contacts with smooth Coulomb
    friction. Integration is semi-implicit Euler with quaternion exp updates.
  * No data-dependent control flow: resets and contacts are masked, the
    substep loop is a `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# Dynamics contractions must not run at DEFAULT TPU precision: a single
# bf16 MXU pass loses ~1e-3 relative precision, which corrupts the mass
# matrix (lever-arm terms m*c^2 are large). HIGH (bf16_3x, ~1e-6 rel) is
# indistinguishable from fp32 for rigid-body dynamics at half the MXU
# passes of HIGHEST (bf16_6x); CPU tests always run true fp32 regardless.
_PREC = jax.lax.Precision.HIGH

# The CONTACT path tolerates single-pass bf16 (~4e-3 rel): Jacobian lever
# arms, friction frames and force reconstruction are all O(1)-magnitude
# geometry whose 0.4% rounding is far below contact-model uncertainty
# (penalty stiffness, regularized Coulomb). Penetration depths never ride
# these matmuls (top_k output stays fp32). The LHS term dt*J c J^T it
# produces is diagonally dominated by M + dt*Kd, so the solve stays SPD.
# 3x fewer MXU passes on the two largest substep matmuls (measured
# TPU-vs-fp32 qacc agreement ~1e-3 rel; bench.py cross-checks every run).
_CPREC = jax.lax.Precision.DEFAULT

from phc_tpu import transforms as T
from phc_tpu.physics import model as model_mod
from phc_tpu.physics.model import PhysicsModel
from phc_tpu.physics.solver import (
    chol_factor_lanes,
    chol_resolve_lanes,
    chol_solve_lanes,
    spd_inverse,
    spd_solve,
)


class PhysicsState(NamedTuple):
    """Dynamic simulation state (device pytree), batched over envs."""

    root_pos: jax.Array  # (B, 3)
    joint_quat: jax.Array  # (B, J, 4) xyzw; [:, 0] is root orientation
    vel: jax.Array  # (B, 6 + 3*(J-1)) generalized velocity

    @property
    def batch(self) -> int:
        return self.root_pos.shape[0]


class BodyFrame(NamedTuple):
    """World-frame per-body kinematics derived from a PhysicsState."""

    rot: jax.Array  # (B, J, 4) body orientation
    pos: jax.Array  # (B, J, 3) body origin (= joint anchor)
    lin_vel: jax.Array  # (B, J, 3) velocity of the body origin
    ang_vel: jax.Array  # (B, J, 3) angular velocity (world frame)


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------


def forward_kinematics(model: PhysicsModel, state: PhysicsState) -> BodyFrame:
    """FK + velocity propagation, level-scheduled (few fused steps)."""
    J = model.num_bodies
    local_t = jnp.asarray(model.local_offsets)

    rot = jnp.zeros_like(state.joint_quat)
    pos = jnp.zeros(state.joint_quat.shape[:-1] + (3,))
    omg = jnp.zeros_like(pos)
    lin = jnp.zeros_like(pos)

    root_rot = state.joint_quat[:, 0]
    rot = rot.at[:, 0].set(root_rot)
    pos = pos.at[:, 0].set(state.root_pos)
    # root angular velocity is stored in the body frame (MuJoCo freejoint)
    omg = omg.at[:, 0].set(T.quat_rotate(root_rot, state.vel[:, 3:6]))
    lin = lin.at[:, 0].set(state.vel[:, 0:3])

    joint_omega = state.vel[:, 6:].reshape(state.vel.shape[0], J - 1, 3)

    for level in model.levels[1:]:
        ids = jnp.asarray(level)
        par = jnp.asarray(model.parents[level])
        p_rot = rot[:, par]
        new_rot = T.quat_mul_norm(p_rot, state.joint_quat[:, ids])
        offset_w = T.quat_rotate(p_rot, local_t[ids])
        new_pos = pos[:, par] + offset_w
        # child angular velocity: parent's + joint rate (child frame -> world)
        new_omg = omg[:, par] + T.quat_rotate(new_rot, joint_omega[:, ids - 1])
        new_lin = lin[:, par] + jnp.cross(omg[:, par], offset_w)
        rot = rot.at[:, ids].set(new_rot)
        pos = pos.at[:, ids].set(new_pos)
        omg = omg.at[:, ids].set(new_omg)
        lin = lin.at[:, ids].set(new_lin)

    return BodyFrame(rot=rot, pos=pos, lin_vel=lin, ang_vel=omg)


def dof_positions(state: PhysicsState) -> jax.Array:
    """Exp-map joint coordinates (B, 3*(J-1)) — the env-facing dof_pos."""
    B, J, _ = state.joint_quat.shape
    return T.quat_to_exp_map(state.joint_quat[:, 1:]).reshape(B, 3 * (J - 1))


def dof_velocities(state: PhysicsState) -> jax.Array:
    return state.vel[:, 6:]


# ---------------------------------------------------------------------------
# Spatial algebra helpers (Plücker coordinates about the world origin,
# angular-first: m = [omega; v_origin], f = [torque_origin; force])
# ---------------------------------------------------------------------------


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def _spatial_inertia_world(model: PhysicsModel, frame: BodyFrame) -> jax.Array:
    """(B, J, 6, 6) spatial inertia of each body about the world origin."""
    R = T.quat_to_rotmat(frame.rot)  # (B, J, 3, 3)
    m = jnp.asarray(model.mass)[None, :, None, None]
    com_w = frame.pos + T.quat_rotate(frame.rot, jnp.asarray(model.com))
    I_com = jnp.einsum("bjxy,jyz,bjwz->bjxw", R, jnp.asarray(model.inertia), R, precision=_PREC)
    C = _skew(com_w)  # (B, J, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), C.shape)
    top_left = I_com + m * jnp.einsum("bjxy,bjzy->bjxz", C, C, precision=_PREC)
    top_right = m * C
    bot_left = m * jnp.swapaxes(C, -1, -2)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _motion_subspace(model: PhysicsModel, frame: BodyFrame) -> jax.Array:
    """(B, N, 6) world-frame Plücker motion vector of each velocity dof.

    Root translations: [0; e_k]. Rotational dof with world axis a through
    anchor x: [a; x × a].
    """
    B, J = frame.rot.shape[:2]
    R = T.quat_to_rotmat(frame.rot)  # columns = body axes in world

    # root: 3 translational + 3 rotational (axes = root body axes, anchor x0)
    S_trans = jnp.concatenate(
        [jnp.zeros((B, 3, 3)), jnp.broadcast_to(jnp.eye(3), (B, 3, 3))], axis=-1
    )  # (B, 3, 6)
    x0 = frame.pos[:, 0]
    root_axes = jnp.swapaxes(R[:, 0], -1, -2)  # (B, 3(axes), 3)
    S_rot_root = jnp.concatenate([root_axes, jnp.cross(x0[:, None, :], root_axes)], axis=-1)

    # ball joints: axes = child body axes, anchor = child origin
    axes = jnp.swapaxes(R[:, 1:], -1, -2)  # (B, J-1, 3(axes), 3)
    anchors = frame.pos[:, 1:, None, :]
    S_ball = jnp.concatenate([axes, jnp.cross(anchors, axes)], axis=-1)  # (B, J-1, 3, 6)
    S_ball = S_ball.reshape(B, 3 * (J - 1), 6)

    return jnp.concatenate([S_trans, S_rot_root, S_ball], axis=1)  # (B, N, 6)


_DOF_BODY = None  # cache of dof -> body mapping per model id


def _dof_body_ids(model: PhysicsModel) -> np.ndarray:
    J = model.num_bodies
    return np.concatenate([[0] * 6, np.repeat(np.arange(1, J), 3)]).astype(np.int32)


def _composite_inertia(model: PhysicsModel, I_sp: jax.Array) -> jax.Array:
    """Subtree spatial inertias: Ic[j] = sum over descendants-or-self of j.

    One (J, J) mask einsum instead of a reverse-level scatter-add loop —
    TPU scatters with duplicate indices are catastrophically slow, and all
    inertias share the world-origin reference point so plain summation is
    exact.
    """
    desc = jnp.asarray(model.ancestor_mask.T.astype(np.float32))  # desc[j, i]
    return jnp.einsum("ji,bixy->bjxy", desc, I_sp, precision=_PREC)


# ---------------------------------------------------------------------------
# Component-form (SoA) dynamics — the production CRBA/RNEA path.
#
# The 6x6 spatial-inertia formulation above materializes (B, J, 6, 6) and
# (B, J, 6) arrays whose tiny minor dims lane-pad 21-42x in HBM; building
# I_sp alone measures 3.1 ms at B=4096 on v5e (experiments/mass_bench.py).
# The closed forms below operate on (B, J) / (B, N) component arrays (lane
# dim = J/N, modest padding), use the algebraic identity
#   I_sp [w; v] = [I_com w + m c x (w x c) + m c x v ;  m (w x c) + m v]
# so no 6x6 is ever formed, and reduce subtree sums to one small batched
# matmul. Validated against MuJoCo exactly like the reference path (tests
# pin mass_matrix/bias_forces to qM/qfrc_bias).
# ---------------------------------------------------------------------------


def _cross_c(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dyn_params(model: PhysicsModel, frame: BodyFrame):
    """Per-body dynamic parameters as (B, J) component arrays:
    world COM c, I_com (world, 6 sym comps), h = m c, and the composite
    (subtree) sums h_sub / G_sub with G = I_com + m(|c|^2 I - c c^T)."""
    R = _rotmat_comps(frame.rot)  # 9 x (B, J), R[3r+c]
    m = model.mass.astype(np.float32)[None]  # (1, J) const
    comb = model.com.astype(np.float32)  # (J, 3) body-frame const
    pos = tuple(frame.pos[..., i] for i in range(3))

    # world COM: c = pos + R @ com_body
    c = tuple(
        pos[r] + R[3 * r + 0] * comb[None, :, 0] + R[3 * r + 1] * comb[None, :, 1] + R[3 * r + 2] * comb[None, :, 2]
        for r in range(3)
    )

    # I_com(world) = R I_b R^T, I_b const (J, 3, 3): 6 unique comps
    Ib = model.inertia.astype(np.float32)  # (J, 3, 3)

    def iw(r, s):
        acc = 0.0
        for p in range(3):
            for q in range(3):
                acc = acc + R[3 * r + p] * Ib[None, :, p, q] * R[3 * s + q]
        return acc

    Iw = {"xx": iw(0, 0), "xy": iw(0, 1), "xz": iw(0, 2), "yy": iw(1, 1), "yz": iw(1, 2), "zz": iw(2, 2)}

    h = tuple(m * c[i] for i in range(3))
    c2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
    G = (
        Iw["xx"] + m * (c2 - c[0] * c[0]),
        Iw["xy"] - m * c[0] * c[1],
        Iw["xz"] - m * c[0] * c[2],
        Iw["yy"] + m * (c2 - c[1] * c[1]),
        Iw["yz"] - m * c[1] * c[2],
        Iw["zz"] + m * (c2 - c[2] * c[2]),
    )

    # subtree sums: one batched matmul over 9 stacked components
    desc = model.ancestor_mask.T.astype(np.float32)  # desc[j, i] = i in subtree(j)
    X = jnp.stack([*h, *G], axis=1)  # (B, 9, J)
    Xs = jnp.einsum("ji,bci->bcj", jnp.asarray(desc), X, precision=_PREC)
    h_sub = tuple(Xs[:, i] for i in range(3))
    G_sub = tuple(Xs[:, 3 + i] for i in range(6))
    m_sub = (desc @ model.mass).astype(np.float32)  # (J,) const

    return dict(R=R, c=c, Iw=Iw, h=h, m=m, h_sub=h_sub, G_sub=G_sub, m_sub=m_sub)


def _motion_subspace_comps(model: PhysicsModel, frame: BodyFrame):
    """Motion subspace as 6 component arrays (B, N): (a_x, a_y, a_z,
    l_x, l_y, l_z) with a the world rotation axis and l = anchor x a
    (root translations: a = 0, l = e_k). Same values as _motion_subspace,
    no (B, N, 6) lane-padded materialization."""
    B, J = frame.rot.shape[:2]
    R = _rotmat_comps(frame.rot)
    pos = tuple(frame.pos[..., i] for i in range(3))

    # ball dofs: axis of dof (j, d) = column d of R_j
    def ball_axis(w):  # world component w of the 3 axes, (B, J-1, 3) -> (B, 69)
        cols = jnp.stack([R[3 * w + d][:, 1:] for d in range(3)], axis=-1)
        return cols.reshape(B, 3 * (J - 1))

    a_ball = tuple(ball_axis(w) for w in range(3))
    dof_body_ball = np.repeat(np.arange(1, J), 3)
    x_ball = tuple(pos[w][:, dof_body_ball] for w in range(3))
    l_ball = _cross_c(x_ball, a_ball)

    # root: 3 translational ([0; e_k]) + 3 rotational (axes = root body
    # axes = columns of R_0, anchor = root position)
    zeros3 = jnp.zeros((B, 3))
    eye = np.eye(3, dtype=np.float32)
    a_root_rot = tuple(jnp.stack([R[3 * w + d][:, 0] for d in range(3)], axis=-1) for w in range(3))
    x_root = tuple(jnp.broadcast_to(pos[w][:, 0:1], (B, 3)) for w in range(3))
    l_root_rot = _cross_c(x_root, a_root_rot)

    a_c = tuple(jnp.concatenate([zeros3, a_root_rot[w], a_ball[w]], axis=1) for w in range(3))
    l_c = tuple(
        jnp.concatenate([jnp.broadcast_to(eye[None, :, w], (B, 3)), l_root_rot[w], l_ball[w]], axis=1)
        for w in range(3)
    )
    return (*a_c, *l_c)  # 6 x (B, N)


def _mass_matrix_comps(model: PhysicsModel, params, Sc) -> jax.Array:
    """CRBA mass matrix from component arrays: F_n = Ic[body(n)] S_n via
    the closed form (no 6x6), M = sum_i F_i outer S_i (6 fused FMAs)."""
    a = Sc[0:3]
    l = Sc[3:6]
    dof_body = _dof_body_ids(model)

    h = tuple(params["h_sub"][i][:, dof_body] for i in range(3))
    Gxx, Gxy, Gxz, Gyy, Gyz, Gzz = (params["G_sub"][i][:, dof_body] for i in range(6))
    m = params["m_sub"][dof_body][None]  # (1, N) const

    hxl = _cross_c(h, l)
    F_top = (
        Gxx * a[0] + Gxy * a[1] + Gxz * a[2] + hxl[0],
        Gxy * a[0] + Gyy * a[1] + Gyz * a[2] + hxl[1],
        Gxz * a[0] + Gyz * a[1] + Gzz * a[2] + hxl[2],
    )
    axh = _cross_c(a, h)
    F_bot = tuple(axh[i] + m * l[i] for i in range(3))

    F6 = (*F_top, *F_bot)
    M_full = sum(F6[i][:, :, None] * Sc[i][:, None, :] for i in range(6))

    anc = model.ancestor_mask[np.ix_(dof_body, dof_body)]  # (N, N)
    N = M_full.shape[-1]
    eye = np.eye(N, dtype=bool)
    lower = jnp.asarray(anc & ~eye)
    M = jnp.where(lower, M_full, 0.0)
    M = jnp.where(lower.T, jnp.swapaxes(M, -1, -2), M)
    M = jnp.where(jnp.asarray(eye), M_full, M)
    arm = np.concatenate([np.zeros(6, np.float32), model.armature])
    return M + jnp.asarray(np.diag(arm)[None])


def _bias_comps(model: PhysicsModel, frame: BodyFrame, state: PhysicsState, params, Sc) -> jax.Array:
    """RNEA bias (Coriolis/centrifugal + gravity) on component arrays."""
    B, J = frame.rot.shape[:2]
    pos = tuple(frame.pos[..., i] for i in range(3))
    w = tuple(frame.ang_vel[..., i] for i in range(3))
    lin = tuple(frame.lin_vel[..., i] for i in range(3))
    wxp = _cross_c(w, pos)
    v_o = tuple(lin[i] - wxp[i] for i in range(3))

    # bias acceleration: a[b] = sum of per-body velocity-product terms over
    # b's ancestor chain. Each body's term depends only on its OWN frame
    # quantities (total body velocity w/v_o and its joint-rate subspace
    # velocity), so the recursion a[child] = a[parent] + term(child) is a
    # prefix sum over ancestors — one batched ancestor-mask matmul instead
    # of a level-by-level scatter loop (the scatters dominated the whole
    # dynamics build on TPU: ~5 ms/step at B=4096 vs ~0.3 ms for this).
    g = model.gravity
    root_sdot = -jnp.cross(frame.ang_vel[:, 0], state.vel[:, 0:3])  # (B, 3)
    grav = np.array([0.0, 0.0, g], np.float32)

    joint_omega = state.vel[:, 6:].reshape(B, J - 1, 3)
    w_rel = T.quat_rotate(frame.rot[:, 1:], joint_omega)  # (B, J-1, 3) world
    zero1 = jnp.zeros((B, 1))
    sv_ang = tuple(jnp.concatenate([zero1, w_rel[..., i]], axis=1) for i in range(3))
    sv_lin = _cross_c(pos, sv_ang)
    term_aw = _cross_c(w, sv_ang)  # w x sv_ang (zero at root)
    t1 = _cross_c(w, sv_lin)
    t2 = _cross_c(v_o, sv_ang)
    # root term: av[root] = -g + root_sdot (aw[root] = 0)
    term_av = tuple(
        (t1[i] + t2[i]).at[:, 0].add(-grav[i] + root_sdot[:, i]) for i in range(3)
    )

    anc = jnp.asarray(model.ancestor_mask.astype(np.float32))  # [i, j] = j anc-or-self of i
    Xt = jnp.stack([*term_aw, *term_av], axis=1)  # (B, 6, J)
    Xa = jnp.einsum("ij,bcj->bci", anc, Xt, precision=_PREC)
    aw = tuple(Xa[:, i] for i in range(3))
    av = tuple(Xa[:, 3 + i] for i in range(3))

    # closed-form spatial-inertia products (about the world origin):
    #   I [w; v] = [Iw w + m c x (w x c) + m c x v ; m (w x c) + m v]
    c = params["c"]
    Iw = params["Iw"]
    m = params["m"]

    def I_apply(wc, vc):
        iww = (
            Iw["xx"] * wc[0] + Iw["xy"] * wc[1] + Iw["xz"] * wc[2],
            Iw["xy"] * wc[0] + Iw["yy"] * wc[1] + Iw["yz"] * wc[2],
            Iw["xz"] * wc[0] + Iw["yz"] * wc[1] + Iw["zz"] * wc[2],
        )
        wxc = _cross_c(wc, c)
        inner = tuple(wxc[i] + vc[i] for i in range(3))  # (w x c) + v
        cxi = _cross_c(c, inner)
        n = tuple(iww[i] + m * cxi[i] for i in range(3))
        f = tuple(m * inner[i] for i in range(3))
        return n, f

    n_v, f_v = I_apply(w, v_o)  # I v
    n_a, f_a = I_apply(aw, av)  # I a

    # v x* (I v) = [w x n + v x f ; w x f]
    wxn = _cross_c(w, n_v)
    vxf_ = _cross_c(v_o, f_v)
    wxf = _cross_c(w, f_v)
    fb_top = tuple(n_a[i] + wxn[i] + vxf_[i] for i in range(3))
    fb_bot = tuple(f_a[i] + wxf[i] for i in range(3))

    # subtree wrench sums (one batched matmul over 6 stacked comps)
    desc = jnp.asarray(model.ancestor_mask.T.astype(np.float32))
    Xf = jnp.stack([*fb_top, *fb_bot], axis=1)  # (B, 6, J)
    Xs = jnp.einsum("ji,bci->bcj", desc, Xf, precision=_PREC)

    dof_body = _dof_body_ids(model)
    tau = 0.0
    for i in range(6):
        tau = tau + Sc[i] * Xs[:, i][:, dof_body]
    return tau


def _bias_dispatch(model: PhysicsModel, frame, state, params, Sc) -> jax.Array:
    """RNEA bias: fused batch-in-lanes Pallas kernel on TPU (lanes solver
    mode — ~25x cheaper than the XLA component path at B=4096, see
    lanes_dyn.py), component path elsewhere. Both compute identical math."""
    solver = model.solver
    if solver == "auto":
        solver = "lanes" if jax.default_backend() == "tpu" else "schur"
    if solver == "lanes":
        from phc_tpu.physics import lanes_dyn

        return lanes_dyn.bias_forces_lanes(model, frame, state)
    return _bias_comps(model, frame, state, params, Sc)


def mass_matrix(model: PhysicsModel, frame: BodyFrame) -> jax.Array:
    """Joint-space mass matrix via world-frame CRBA. (B, N, N)."""
    params = _dyn_params(model, frame)
    Sc = _motion_subspace_comps(model, frame)
    return _mass_matrix_comps(model, params, Sc)


def _mass_matrix_from(model: PhysicsModel, I_sp: jax.Array, S: jax.Array) -> jax.Array:
    Ic = _composite_inertia(model, I_sp)

    # NOTE on layout: the dof-level gather Ic[:, dof_body] looks wasteful
    # ((B, N, 6, 6) materialization) but measures FASTEST on v5e — per-joint
    # block-reshape variants (S.reshape(B, J-1, 3, 6) + block einsums) are
    # 2x slower because the reshapes force relayout copies
    # (experiments/mass_bench.py: 3.4 vs 6.7 ms).
    dof_body = _dof_body_ids(model)
    Ic_d = Ic[:, jnp.asarray(dof_body)]  # (B, N, 6, 6)
    F = jnp.einsum("bnij,bnj->bni", Ic_d, S, precision=_PREC)  # (B, N, 6)

    M_full = jnp.einsum("bni,bmi->bnm", F, S, precision=_PREC)  # MXU batched matmul

    # mask: M[d1, d2] valid where body(d2) is ancestor-or-self of body(d1);
    # symmetrize branch-free with selects only (scatters on (B, N, N) cost
    # milliseconds on TPU)
    anc = model.ancestor_mask[np.ix_(dof_body, dof_body)]  # (N, N)
    N = S.shape[1]
    eye = np.eye(N, dtype=bool)
    lower = jnp.asarray(anc & ~eye)
    M = jnp.where(lower, M_full, 0.0)
    M = jnp.where(lower.T, jnp.swapaxes(M, -1, -2), M)  # fill upper from lower
    M = jnp.where(jnp.asarray(eye), M_full, M)  # diagonal from the direct pass

    # armature on actuated dofs
    arm = np.concatenate([np.zeros(6, np.float32), model.armature])
    return M + jnp.asarray(np.diag(arm)[None])


def bias_forces(model: PhysicsModel, frame: BodyFrame, state: PhysicsState) -> jax.Array:
    """C(q, v): Coriolis/centrifugal + gravity via world-frame RNEA. (B, N).

    Sign convention: M qacc = tau_applied - C (MuJoCo's qfrc_bias).
    """
    params = _dyn_params(model, frame)
    Sc = _motion_subspace_comps(model, frame)
    return _bias_comps(model, frame, state, params, Sc)


def _bias_from(
    model: PhysicsModel, frame: BodyFrame, state: PhysicsState, I_sp: jax.Array, S: jax.Array
) -> jax.Array:
    B, J = frame.rot.shape[:2]

    # spatial velocity about origin: [omega; v - omega x x]
    v_o = frame.lin_vel - jnp.cross(frame.ang_vel, frame.pos)
    v_sp = jnp.concatenate([frame.ang_vel, v_o], axis=-1)  # (B, J, 6)

    # Bias acceleration. Children: a_i = a_parent + v_i x (S_i qdot_i) —
    # valid because ball-joint axes are attached to the child body. The
    # free root is different: its translational axes are WORLD-fixed, so
    # Sdot*qdot = [0; -omega x v_lin] must be added explicitly, on top of
    # the gravity trick (base accelerates upward at -g). Without this term
    # the root bias is wrong whenever the root translates while rotating
    # (verified against MuJoCo qfrc_bias to machine precision).
    g = jnp.array([0.0, 0.0, model.gravity])
    root_sdot_qdot = -jnp.cross(frame.ang_vel[:, 0], state.vel[:, 0:3])
    a = jnp.zeros((B, J, 6))
    a = a.at[:, 0, 3:].set(-g + root_sdot_qdot)

    joint_omega = state.vel[:, 6:].reshape(B, J - 1, 3)
    for level in model.levels[1:]:
        ids = jnp.asarray(level)
        par = jnp.asarray(model.parents[level])
        # S q̇ for this joint in world Plücker coords
        w_rel = T.quat_rotate(frame.rot[:, ids], joint_omega[:, ids - 1])  # (B, L, 3)
        sv_ang = w_rel
        sv_lin = jnp.cross(frame.pos[:, ids], w_rel)
        # spatial cross: v x m = [w1 x w2; w1 x v2 + v1 x w2]
        w1 = v_sp[:, ids, :3]
        v1 = v_sp[:, ids, 3:]
        xm_ang = jnp.cross(w1, sv_ang)
        xm_lin = jnp.cross(w1, sv_lin) + jnp.cross(v1, sv_ang)
        a = a.at[:, ids].set(a[:, par] + jnp.concatenate([xm_ang, xm_lin], axis=-1))

    Iv = jnp.einsum("bjik,bjk->bji", I_sp, v_sp, precision=_PREC)
    Ia = jnp.einsum("bjik,bjk->bji", I_sp, a, precision=_PREC)

    # force-space cross product: v x* f = [w x n + v x f; w x f]
    w = v_sp[..., :3]
    vv = v_sp[..., 3:]
    n = Iv[..., :3]
    f = Iv[..., 3:]
    vxf = jnp.concatenate([jnp.cross(w, n) + jnp.cross(vv, f), jnp.cross(w, f)], axis=-1)

    f_body = Ia + vxf  # (B, J, 6)

    # subtree wrench accumulation as a mask einsum (see _composite_inertia)
    desc = jnp.asarray(model.ancestor_mask.T.astype(np.float32))
    f_acc = jnp.einsum("ji,bix->bjx", desc, f_body, precision=_PREC)

    dof_body = jnp.asarray(_dof_body_ids(model))
    return jnp.einsum("bni,bni->bn", S, f_acc[:, dof_body], precision=_PREC)


# ---------------------------------------------------------------------------
# Contacts (ground plane z=0, penalty + smooth Coulomb friction)
# ---------------------------------------------------------------------------


def contact_kinematics(model: PhysicsModel, frame: BodyFrame):
    """Ground-contact candidate state: world points, velocities, penetration.

    Candidate points come from the collision geometry (sphere centers,
    capsule endpoints, box corners — see model.py); the plane is z=0 with
    the reference's material (friction 1.0, restitution 0,
    `envs/isaacgym_env.py:15-27`, `humanoid_phc.py:255-262`).
    """
    body = jnp.asarray(model.contact_body)
    p_local = jnp.asarray(model.contact_pos)
    radius = jnp.asarray(model.contact_radius)

    rot_b = frame.rot[:, body]
    pos_b = frame.pos[:, body]
    p_world = pos_b + T.quat_rotate(rot_b, p_local)  # (B, P, 3)
    v_point = frame.lin_vel[:, body] + jnp.cross(frame.ang_vel[:, body], p_world - pos_b)

    pen = jnp.maximum(radius - p_world[..., 2], 0.0)  # penetration depth >= 0
    active = (pen > 0.0).astype(p_world.dtype)
    return p_world, v_point, pen, active


def point_jacobian(
    model: PhysicsModel, S: jax.Array, points: jax.Array, body_ids: np.ndarray
) -> jax.Array:
    """J (B, N, P, 3): generalized-coordinate rows of each point's
    world-velocity components, for points attached to bodies `body_ids`
    (static). Row (d, p, axis) = S_d . [p x e_axis; e_axis], masked so only
    ancestors of the owning body contribute.

    The same rows map world point-forces to generalized forces (Q = J f) —
    the role gymtorch's pointer aliasing + PhysX's internal solver played in
    the reference, now one einsum.
    """
    eye = jnp.eye(3)
    # Plücker force vector per (point, axis): [p x e; e]  -> (B, P, 3, 6)
    p_cross_e = jnp.cross(points[..., None, :], eye)  # (B, P, 3, 3)
    W = jnp.concatenate([p_cross_e, jnp.broadcast_to(eye, p_cross_e.shape)], axis=-1)
    J = jnp.einsum("bni,bpai->bnpa", S, W, precision=_PREC)  # (B, N, P, 3)
    dof_body = _dof_body_ids(model)
    mask = model.ancestor_mask[body_ids][:, dof_body].T  # (N, P)
    return J * jnp.asarray(mask)[None, :, :, None]


def contact_jacobian(model: PhysicsModel, S: jax.Array, points: jax.Array) -> jax.Array:
    """Ground-contact point Jacobians (see point_jacobian)."""
    return point_jacobian(model, S, points, model.contact_body)


# ---------------------------------------------------------------------------
# Self-collision narrow phase (capsule-capsule per allowed body pair)
# ---------------------------------------------------------------------------


def _segment_closest_points(p1, q1, p2, q2, eps=1e-9):
    """Branch-free closest points between segments [p1,q1] and [p2,q2]
    (Ericson, Real-Time Collision Detection §5.1.9), batched over leading
    dims. Degenerate (zero-length = sphere) segments handled via masked
    selects. Returns (cp1, cp2)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)

    a_ok = a > eps
    e_ok = e > eps
    a_safe = jnp.where(a_ok, a, 1.0)
    e_safe = jnp.where(e_ok, e, 1.0)

    denom = a * e - b * b
    s0 = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.where(denom > eps, denom, 1.0), 0.0, 1.0), 0.0)
    t0 = jnp.clip((b * s0 + f) / e_safe, 0.0, 1.0)
    s_gen = jnp.clip((b * t0 - c) / a_safe, 0.0, 1.0)

    s = jnp.where(a_ok & e_ok, s_gen, jnp.where(a_ok, jnp.clip(-c / a_safe, 0.0, 1.0), 0.0))
    t = jnp.where(a_ok & e_ok, t0, jnp.where(e_ok, jnp.clip(f / e_safe, 0.0, 1.0), 0.0))
    return p1 + s[..., None] * d1, p2 + t[..., None] * d2


def _tangent_basis(n):
    """Orthonormal (t1, t2) ⊥ n, branch-free (Duff et al. 2017)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], -1)
    t2 = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t1, t2


def _candidate_tables(model: PhysicsModel):
    """Static per-candidate tables over [ground points ++ self pairs]:
    owning bodies (body_b = −1 for the ground plane) and per-dof ancestor
    masks (N,) used to zero non-ancestor Jacobian rows."""
    cache = model_mod.derived_cache(model)
    hit = cache.get("cand_tables")
    if hit is not None:
        return hit
    P = model.contact_body.shape[0]
    body_a = np.concatenate([model.contact_body, model.pair_body[:, 0]]).astype(np.int32)
    body_b = np.concatenate(
        [np.full(P, -1, np.int32), model.pair_body[:, 1].astype(np.int32)]
    )
    dof_body = _dof_body_ids(model)
    anc_a = model.ancestor_mask[body_a][:, dof_body].astype(np.float32)  # (C, N)
    anc_b = np.where(
        (body_b >= 0)[:, None],
        model.ancestor_mask[np.maximum(body_b, 0)][:, dof_body],
        False,
    ).astype(np.float32)
    out = (body_a, body_b, anc_a, anc_b)
    cache["cand_tables"] = out
    return out


def self_contact_kinematics(model: PhysicsModel, frame: BodyFrame):
    """Narrow phase over the precomputed allowed body pairs (model.pair_*).

    Replaces PhysX's filtered self-collision (`humanoid_phc.py:370-381`) with
    one vectorized capsule-capsule pass. Returns, per pair: surface contact
    points on each body (world), relative velocity at the contact, the
    world->contact rotation (rows t1, t2, n with n pointing from body_b to
    body_a), penetration depth and an active mask.
    """
    ba = model.pair_body[:, 0]
    bb = model.pair_body[:, 1]
    seg = jnp.asarray(model.pair_seg)  # (K, 2, 2, 3) local endpoints
    rad = jnp.asarray(model.pair_rad)  # (K, 2)

    rot_a, pos_a = frame.rot[:, ba], frame.pos[:, ba]
    rot_b, pos_b = frame.rot[:, bb], frame.pos[:, bb]
    p1 = pos_a + T.quat_rotate(rot_a, seg[None, :, 0, 0])
    q1 = pos_a + T.quat_rotate(rot_a, seg[None, :, 0, 1])
    p2 = pos_b + T.quat_rotate(rot_b, seg[None, :, 1, 0])
    q2 = pos_b + T.quat_rotate(rot_b, seg[None, :, 1, 1])

    cp1, cp2 = _segment_closest_points(p1, q1, p2, q2)
    diff = cp1 - cp2
    dist = jnp.linalg.norm(diff, axis=-1)
    n = jnp.where((dist > 1e-6)[..., None], diff / jnp.maximum(dist, 1e-6)[..., None], jnp.array([0.0, 0.0, 1.0]))
    pen = jnp.maximum(rad[None, :, 0] + rad[None, :, 1] - dist, 0.0)
    active = (pen > 0.0).astype(diff.dtype)

    # surface points (coincident up to penetration depth)
    x_a = cp1 - rad[None, :, 0, None] * n
    x_b = cp2 + rad[None, :, 1, None] * n

    v_a = frame.lin_vel[:, ba] + jnp.cross(frame.ang_vel[:, ba], x_a - pos_a)
    v_b = frame.lin_vel[:, bb] + jnp.cross(frame.ang_vel[:, bb], x_b - pos_b)
    v_rel = v_a - v_b

    t1, t2 = _tangent_basis(n)
    R_c = jnp.stack([t1, t2, n], axis=-2)  # (B, K, 3, 3) rows = contact axes
    return x_a, x_b, v_rel, R_c, pen, active


# ---------------------------------------------------------------------------
# Actuation + stepping
# ---------------------------------------------------------------------------


def pd_actuation(model: PhysicsModel, state: PhysicsState, pd_target: jax.Array, dt: float):
    """Stable-PD torques (explicit part) on the ball-joint exp-map coords.

    tau = kp*(target - q - dt*qdot) - kd*qdot, with the kd*dt*qacc part
    moved into the LHS of the solve (Tan et al. stable PD; replaces Isaac's
    internal PD, reference `humanoid_phc.py:127-128` + DOF_MODE_POS).
    """
    q = dof_positions(state)
    qd = dof_velocities(state)
    kp = jnp.asarray(model.kp)
    kd = jnp.asarray(model.kd)
    tau = kp * (pd_target - q - dt * qd) - kd * qd
    return tau  # (B, 69)


def step(model: PhysicsModel, state: PhysicsState, pd_target: jax.Array, body_force=None):
    """One control step = `model.substeps` physics substeps.

    substep_mode "full": every substep recomputes FK/dynamics/contacts
    (lax.scan over _physics_substep). substep_mode "frozen": the system is
    built and factored once per control step, the substeps are velocity
    iterations against the frozen factorization (see _step_frozen).

    body_force: optional (B, J, 3) world-frame external forces applied at
    each body origin, held for the whole control step — the TPU-native
    analog of the reference viewer's projectile perturbations
    (`render_env.py:273-295,337-356`). None compiles the force-free program.

    Returns (new_state, info dict with contact forces and dof torques of the
    last substep).
    """
    if model.substep_mode == "frozen":
        return _step_frozen(model, state, pd_target, body_force)

    def substep(s, _):
        s2, info = _physics_substep(model, s, pd_target, body_force)
        return s2, info

    state, infos = jax.lax.scan(substep, state, None, length=model.substeps)
    info = jax.tree_util.tree_map(lambda x: x[-1], infos)
    return state, info


def _external_generalized_force(model: PhysicsModel, frame: BodyFrame, Sc, body_force):
    """Q_ext (B, N) from world point forces at body origins.

    Q_n = S_n . sum_{j in subtree(n)} [p_j x f_j; f_j]. The (n, j) ancestry
    mask factors out of the component sum, so this is 6 small (B,J)@(J,N)
    matmuls + fused elementwise — no (B, N, J) materialization.
    """
    pos = tuple(frame.pos[..., i] for i in range(3))
    f = tuple(body_force[..., i] for i in range(3))
    pxf = _cross3(pos, f)
    dof_body = _dof_body_ids(model)
    anc_t = jnp.asarray(model.ancestor_mask[:, dof_body].astype(np.float32))  # (J, N)
    Q = 0.0
    for w in range(3):
        Q = Q + Sc[w] * (pxf[w] @ anc_t) + Sc[3 + w] * (f[w] @ anc_t)
    return Q


class ContactSystem(NamedTuple):
    """Compacted contact system in structure-of-arrays form.

    TPU layout note: arrays with tiny trailing dims ((...,3) vectors,
    (...,3,3) frames) pad their lane dimension to 128 — a 10-40x memory
    tax at every materialization. The contact path is therefore built from
    (B, A) component arrays and one merged (B, N, 3A) Jacobian whose minor
    dim is MXU/VREG-sized. Column order is x-major: m = axis * A + contact,
    axis in (t1, t2, n). A here is the SECTION-PADDED slot count (8-aligned
    so the fused kernel can DMA unsliced); pad slots carry body ids of -1,
    zero masks/coefficients and non-positive penetration, so they are
    inert in every consumer.

    Alongside the assembled Jacobian the compacted PRIMITIVES are carried
    for the fused TPU path, which assembles the Jacobian directly in the
    env-minor lanes layout (one fused pass instead of transpose+pad) —
    whichever assembly a given path doesn't consume is dead code for XLA.
    """

    Jm: jax.Array  # (B, N, 3A) contact-frame relative-velocity Jacobian
    v_t1: jax.Array  # (B, A) relative velocity along t1
    v_t2: jax.Array
    v_n: jax.Array
    pen: jax.Array  # (B, A)
    active: jax.Array  # (B, A)
    t1: tuple  # 3 x (B, A) world components of tangent 1
    t2: tuple
    n: tuple
    oh_signed: jax.Array  # (B, A, J) +1 at body_a, -1 at body_b (0 for ground)
    x_a: tuple  # 3 x (B, A) application point on body a (world)
    x_b: tuple
    mA: jax.Array  # (B, NP, A) ancestor dof mask of body a (NP = padded N)
    mB: jax.Array


def _rotmat_comps(q):
    """Quaternion (B, J, 4) xyzw -> 9 rotation-matrix component arrays
    (B, J). Components-as-arrays avoids (...,3,3) lane padding."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
        2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
        2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
    )


def _rot_point(R, sx, sy, sz):
    """Apply rotation (9 component arrays) to a static/broadcast point."""
    return (
        R[0] * sx + R[1] * sy + R[2] * sz,
        R[3] * sx + R[4] * sy + R[5] * sz,
        R[6] * sx + R[7] * sy + R[8] * sz,
    )


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _seg_st_soa(p1, q1, p2, q2, eps=1e-9):
    """Closest-point parameters (s, t) between segments, SoA components
    (same branch-free Ericson logic as _segment_closest_points)."""
    d1 = tuple(q1[i] - p1[i] for i in range(3))
    d2 = tuple(q2[i] - p2[i] for i in range(3))
    r = tuple(p1[i] - p2[i] for i in range(3))
    a = _dot3(d1, d1)
    e = _dot3(d2, d2)
    f = _dot3(d2, r)
    c = _dot3(d1, r)
    b = _dot3(d1, d2)

    a_ok = a > eps
    e_ok = e > eps
    a_safe = jnp.where(a_ok, a, 1.0)
    e_safe = jnp.where(e_ok, e, 1.0)

    denom = a * e - b * b
    s0 = jnp.where(
        denom > eps,
        jnp.clip((b * f - c * e) / jnp.where(denom > eps, denom, 1.0), 0.0, 1.0),
        0.0,
    )
    t0 = jnp.clip((b * s0 + f) / e_safe, 0.0, 1.0)
    s_gen = jnp.clip((b * t0 - c) / a_safe, 0.0, 1.0)

    s_par = jnp.where(a_ok & e_ok, s_gen, jnp.where(a_ok, jnp.clip(-c / a_safe, 0.0, 1.0), 0.0))
    t_par = jnp.where(a_ok & e_ok, t0, jnp.where(e_ok, jnp.clip(f / e_safe, 0.0, 1.0), 0.0))
    return s_par, t_par, d1, d2


def _tangent_basis_soa(nx, ny, nz):
    sgn = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sgn + nz)
    b = nx * ny * a
    t1 = (1.0 + sgn * nx * nx * a, sgn * b, -sgn * nx)
    t2 = (b, sgn + ny * ny * a, -ny)
    return t1, t2


def _candidate_tables_v2(model: PhysicsModel):
    """Unified static candidate tables: [ground points ++ self pairs].
    Ground points are zero-length 'a' capsules against the z=0 plane."""
    cache = model_mod.derived_cache(model)
    hit = cache.get("cand_tables_v2")
    if hit is not None:
        return hit
    P = model.contact_body.shape[0]
    K = model.pair_body.shape[0]
    body_a = np.concatenate([model.contact_body, model.pair_body[:, 0]]).astype(np.int32)
    body_b = np.concatenate([np.full(P, -1, np.int32), model.pair_body[:, 1].astype(np.int32)])
    seg_a0 = np.concatenate([model.contact_pos, model.pair_seg[:, 0, 0]], 0).astype(np.float32)
    seg_a1 = np.concatenate([model.contact_pos, model.pair_seg[:, 0, 1]], 0).astype(np.float32)
    seg_b0 = np.concatenate([np.zeros((P, 3), np.float32), model.pair_seg[:, 1, 0]], 0)
    seg_b1 = np.concatenate([np.zeros((P, 3), np.float32), model.pair_seg[:, 1, 1]], 0)
    rad_a = np.concatenate([model.contact_radius, model.pair_rad[:, 0]]).astype(np.float32)
    rad_b = np.concatenate([np.zeros(P, np.float32), model.pair_rad[:, 1]])
    is_ground = np.concatenate([np.ones(P, np.float32), np.zeros(K, np.float32)])
    is_pair = 1.0 - is_ground
    # per-body dof ancestor mask (24, N): ANC[j, n] = dof n moves body j
    dof_body = _dof_body_ids(model)
    anc_bn = model.ancestor_mask[:, dof_body].astype(np.float32)  # (J, N)
    Jn = anc_bn.shape[0]
    # per-CANDIDATE static rows, consumed through the one-hot selection
    # matmul (see _contact_system): ancestor dof masks of each side and the
    # signed body one-hot for post-solve force aggregation
    anc_a = anc_bn[body_a]  # (C, N)
    anc_b = anc_bn[np.maximum(body_b, 0)] * is_pair[:, None]  # (C, N)
    oh_a = np.zeros((body_a.shape[0], Jn), np.float32)
    oh_a[np.arange(body_a.shape[0]), body_a] = 1.0
    oh_b = np.zeros_like(oh_a)
    oh_b[np.arange(body_b.shape[0]), np.maximum(body_b, 0)] = 1.0
    oh_signed = oh_a - oh_b * is_pair[:, None]  # (C, J)
    # one static matrix: [is_ground | oh_signed | anc_a | anc_b]
    stat = np.concatenate([is_ground[:, None], oh_signed, anc_a, anc_b], axis=1)
    # body-id selection columns: selecting 3 small ints per slot and
    # expanding body -> ancestor mask through a CONSTANT (J, NP) table is
    # ~10x cheaper than selecting the 175-wide static-row matrix (traced)
    bstat = np.stack(
        [body_a.astype(np.float32), np.maximum(body_b, 0).astype(np.float32), is_ground],
        axis=1,
    )  # (C, 3)
    NPad = -(-dof_body.shape[0] // 8) * 8
    anc_pad = np.zeros((Jn, NPad), np.float32)
    anc_pad[:, : dof_body.shape[0]] = anc_bn
    out = dict(
        body_a=body_a, body_b=body_b,
        seg_a0=seg_a0, seg_a1=seg_a1, seg_b0=seg_b0, seg_b1=seg_b1,
        rad_a=rad_a, rad_b=rad_b, is_ground=is_ground, anc_bn=anc_bn,
        stat=stat, bstat=bstat, anc_pad=anc_pad, num_bodies=Jn,
    )
    cache["cand_tables_v2"] = out
    return out


def _contact_system(
    model: PhysicsModel, frame: BodyFrame, Sc, _stage: str = "full"
) -> ContactSystem:
    """Candidate narrow phases -> top-k compaction -> merged contact-frame
    Jacobian, all in SoA component form (see ContactSystem docstring).

    ZERO dynamic gathers, by design: per-env dynamic gathers
    (take_along_axis / broadcast advanced indexing) are pathologically slow
    on this backend (~1.7 ms each, measured) and one form crashed the TPU
    runtime. Instead, phase 1 computes FULL contact geometry for all C
    candidates using only constant-index gathers (cheap elementwise work on
    (B, C) component arrays), then the model.max_contacts
    deepest-penetrating candidates are compacted with ONE one-hot
    selection matmul (exact: one-hot rows of 0/1). Per-candidate STATIC
    data (ancestor dof masks, signed body one-hots) ride the same
    selection through a constant (C, F) matrix. Inactive slots carry zero
    coefficients, so the result is EXACT whenever <= max_contacts
    candidates are active (typical humanoid: < 40 of ~270).
    """
    B, J = frame.rot.shape[:2]
    N = Sc[0].shape[1]
    tab = _candidate_tables_v2(model)
    ba_np, bb_np = tab["body_a"], tab["body_b"]
    bb0_np = np.maximum(bb_np, 0)
    C = ba_np.shape[0]
    A = model.max_contacts if (model.max_contacts and model.max_contacts < C) else C

    # On TPU the whole narrow phase runs as ONE lanes kernel
    # (lanes_dyn.narrow_phase_lanes — identical math, parity-tested); the
    # XLA path below is the CPU/test oracle.
    solver = model.solver
    if solver == "auto":
        solver = "lanes" if jax.default_backend() == "tpu" else "schur"
    if solver == "lanes" and _stage == "full":
        from phc_tpu.physics import lanes_dyn

        if A < C and A % 8 == 0:
            # fused narrow phase + in-VMEM top-A compaction: the sort,
            # the pred one-hot chain and the (B, 12, C) feature
            # materialization never leave the kernel (see
            # lanes_dyn._make_narrow_topk_kernel)
            pre = lanes_dyn.narrow_phase_topk_lanes(model, frame, A)
            return _compact_contacts(
                model, tab, Sc, None, None, None, B, J, N, C, A, _stage, pre=pre
            )
        pen_all, Fd_all = lanes_dyn.narrow_phase_lanes(model, frame)
        return _compact_contacts(model, tab, Sc, pen_all, Fd_all, None, B, J, N, C, A, _stage)

    # per-body component fields (B, J) — no (...,3) padding anywhere
    R = _rotmat_comps(frame.rot)
    pos = tuple(frame.pos[..., i] for i in range(3))
    lin = tuple(frame.lin_vel[..., i] for i in range(3))
    ang = tuple(frame.ang_vel[..., i] for i in range(3))

    # ---- phase 1: FULL geometry for all C candidates (static gathers) ----
    gat = lambda comp, ids: comp[:, ids]  # ids: constant numpy (C,)
    Ra = tuple(gat(c, ba_np) for c in R)
    Rb = tuple(gat(c, bb0_np) for c in R)
    pa = tuple(gat(c, ba_np) for c in pos)
    pb = tuple(gat(c, bb0_np) for c in pos)

    def world(Rc, pc, name):
        seg = tab[name]  # constant numpy (C, 3)
        w = _rot_point(Rc, seg[None, :, 0], seg[None, :, 1], seg[None, :, 2])
        return tuple(w[i] + pc[i] for i in range(3))

    a0 = world(Ra, pa, "seg_a0")
    a1 = world(Ra, pa, "seg_a1")
    b0 = world(Rb, pb, "seg_b0")
    b1 = world(Rb, pb, "seg_b1")

    s, t, d1, d2 = _seg_st_soa(a0, a1, b0, b1)
    cp1 = tuple(a0[i] + s * d1[i] for i in range(3))
    cp2 = tuple(b0[i] + t * d2[i] for i in range(3))
    diff = tuple(cp1[i] - cp2[i] for i in range(3))
    dist = jnp.sqrt(jnp.maximum(_dot3(diff, diff), 1e-12))

    rad_a = tab["rad_a"][None]  # (1, C) constants, broadcast
    rad_b = tab["rad_b"][None]
    is_g = tab["is_ground"][None]
    is_pair = 1.0 - is_g

    # SIGNED depth (positive = penetrating): forces are gated by the active
    # mask (pen > 0) everywhere, so keeping the sign is free — and it makes
    # the top-k selection rank near-surface candidates by true proximity
    # instead of tying at 0, which the frozen-substep mode relies on for
    # mid-control-step contact activation (pen_i integrates with dt*v_n and
    # may cross 0 between system rebuilds).
    pen_ground = rad_a - a0[2]
    pen_pair = rad_a + rad_b - dist
    pen_all = jnp.where(is_g > 0.5, pen_ground, pen_pair)

    inv_d = 1.0 / jnp.maximum(dist, 1e-6)
    valid = (dist > 1e-6) & jnp.broadcast_to(is_g < 0.5, dist.shape)
    nx = jnp.where(valid, diff[0] * inv_d, 0.0)
    ny = jnp.where(valid, diff[1] * inv_d, 0.0)
    nz = jnp.where(valid, diff[2] * inv_d, 1.0)
    n = (nx, ny, nz)

    # contact application points: ground uses the candidate point itself
    # (parity with the validated dense path); pairs use surface points
    x_a = tuple(jnp.where(is_g > 0.5, a0[i], cp1[i] - rad_a * n[i]) for i in range(3))
    x_b = tuple((cp2[i] + rad_b * n[i]) * is_pair for i in range(3))

    va = tuple(gat(c, ba_np) for c in lin)
    wa = tuple(gat(c, ba_np) for c in ang)
    vb = tuple(gat(c, bb0_np) for c in lin)
    wb = tuple(gat(c, bb0_np) for c in ang)
    ra_arm = tuple(x_a[i] - pa[i] for i in range(3))
    rb_arm = tuple(x_b[i] - pb[i] for i in range(3))
    cross_a = _cross3(wa, ra_arm)
    cross_b = _cross3(wb, rb_arm)
    v_rel = tuple(va[i] + cross_a[i] - (vb[i] + cross_b[i]) * is_pair for i in range(3))

    t1, t2 = _tangent_basis_soa(nx, ny, nz)
    v_t1 = _dot3(v_rel, t1)
    v_t2 = _dot3(v_rel, t2)
    v_n = _dot3(v_rel, n)

    # ---- compaction: ONE one-hot selection matmul ------------------------
    # 12-feature basis: the tangents t1/t2 are a deterministic function of
    # n (_tangent_basis_soa), so they are recomputed AFTER selection
    # instead of riding the selection matmul (18 -> 12 selected rows).
    feats = (*x_a, *x_b, *n, v_t1, v_t2, v_n)  # 12 x (B, C)
    if _stage == "narrow":  # perf attribution only (scripts/bench_profile)
        return pen_all, v_n, v_t1, v_t2
    return _compact_contacts(model, tab, Sc, pen_all, None, feats, B, J, N, C, A, _stage)


def _compact_contacts(model, tab, Sc, pen_all, Fd_all, feats, B, J, N, C, A, _stage="full", pre=None):
    """Top-k compaction + Jacobian assembly over narrow-phase outputs.

    Features arrive either stacked (B, 12, C) from the lanes kernel
    (Fd_all), as 12 (B, C) comps from the XLA oracle path (feats), or
    ALREADY COMPACTED from the fused top-k kernel (pre = (pen (B, A),
    fsel (B, A, 12), bsel (B, A, 3)) — the TPU production path).
    Feature order: x_a(3), x_b(3), n(3), v_t1, v_t2, v_n.
    """
    NP = -(-N // 8) * 8
    if pre is not None:
        pen, fsel_k, bsel = pre
        AP = A  # the kernel path requires 8-aligned A: no pad slots
        fs = tuple(fsel_k[..., i] for i in range(12))
        is_pair_s = 1.0 - bsel[..., 2]
        jid = jnp.arange(tab["num_bodies"], dtype=pen.dtype)
        oh_a = (bsel[..., 0:1] == jid).astype(pen.dtype)
        oh_b = (bsel[..., 1:2] == jid).astype(pen.dtype) * is_pair_s[..., None]
    elif A < C:
        AP = -(-A // 8) * 8  # section-padded slot count (8-aligned)
        pen, idx = jax.lax.top_k(pen_all, A)  # (B, A)
        # one-hot rows built directly in the MXU operand dtype on TPU (the
        # pred->bf16 convert + relayout copies cost ~0.3 ms/ctrl
        # otherwise); values are identical — DEFAULT-precision einsums
        # already round these operands to bf16 (accumulation stays fp32,
        # outputs cast back below). CPU keeps exact f32 operands.
        sel_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else Sc[0].dtype
        sel = (idx[..., None] == jnp.arange(C)).astype(sel_dtype)  # (B, A, C)
        if Fd_all is not None:
            Fd = Fd_all.astype(sel_dtype)
        else:
            # Layout guard: stacking per-candidate (B, C) comps re-layouts
            # the whole upstream narrow phase to degenerate (B, 1, C)
            # T(1,128) tiles (~0.9 ms/ctrl-step of 8x-padded sublane
            # traffic, traced on v5e). The barrier pins the comps to their
            # natural 2D layouts and confines the relayout to the stack.
            feats_b = jax.lax.optimization_barrier(
                tuple(jnp.broadcast_to(f, (B, C)) for f in feats)
            )
            Fd = jnp.stack(list(feats_b), axis=1).astype(sel_dtype)
        fsel = jnp.einsum("bac,bfc->baf", sel, Fd, precision=_CPREC).astype(
            jnp.float32
        )  # exact one-hot selection (fp32 accumulation)
        # pad the SLOT axis once at the small-tensor level — every
        # downstream (B, A) array, the masks, the Jacobian sections and
        # the fused kernel's DMA extents inherit 8-aligned sizes for free
        fsel = jnp.pad(fsel, ((0, 0), (0, AP - A), (0, 0)))
        pen = jnp.pad(pen, ((0, 0), (0, AP - A)))  # pad pen <= 0: inactive
        fs = tuple(fsel[..., i] for i in range(12))
        # body-id selection (3 scalars/slot) + constant body->ancestor
        # expansion: replaces the 175-wide static-row selection (one-hot
        # rows are exact, so the selected ids are exact small floats);
        # pad slots get body id -1 -> zero one-hots everywhere
        bsel = jnp.einsum(
            "bac,cf->baf", sel, jnp.asarray(tab["bstat"], sel_dtype), precision=_CPREC
        ).astype(jnp.float32)
        bsel = jnp.pad(bsel, ((0, 0), (0, AP - A), (0, 0)), constant_values=-1.0)
        is_pair_s = 1.0 - bsel[..., 2]
        jid = jnp.arange(tab["num_bodies"], dtype=fsel.dtype)
        oh_a = (bsel[..., 0:1] == jid).astype(fsel.dtype)  # (B, AP, J)
        oh_b = (bsel[..., 1:2] == jid).astype(fsel.dtype) * is_pair_s[..., None]
    else:
        AP = C
        pen = pen_all
        if Fd_all is not None:
            fs = tuple(Fd_all[:, i] for i in range(12))
        else:
            fs = tuple(jnp.broadcast_to(f, (B, C)) for f in feats)
        is_pair_s = jnp.broadcast_to(1.0 - tab["is_ground"][None], (B, C))
        jid = jnp.arange(tab["num_bodies"], dtype=fs[0].dtype)
        oh_a = jnp.broadcast_to(
            (tab["body_a"][:, None] == jid).astype(fs[0].dtype)[None], (B, C, J)
        )
        oh_b = (
            jnp.broadcast_to(
                (np.maximum(tab["body_b"], 0)[:, None] == jid).astype(fs[0].dtype)[None],
                (B, C, J),
            )
            * is_pair_s[..., None]
        )
    x_a, x_b, n = fs[0:3], fs[3:6], fs[6:9]
    v_t1, v_t2, v_n = fs[9], fs[10], fs[11]
    t1, t2 = _tangent_basis_soa(*n)
    oh_signed = oh_a - oh_b  # (B, AP, J)
    # ancestor dof masks through the constant padded table, emitted in the
    # TRANSPOSED (B, AP, NP) layout the fused path's Jacobian/Gram
    # assembly consumes with zero relayout copies. The masks are exactly
    # 0/1 (one-hot row x 0/1 table), so they are stored bf16 on TPU —
    # EXACT, and it halves the HBM reads of the two (B, 3A, NP)-class
    # assembly fusions that consume them (~0.2 ms/ctrl step traced).
    m_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    anc_pad = jnp.asarray(tab["anc_pad"], m_dtype)  # (J, NP)
    mA = jnp.einsum("baj,jn->ban", oh_a.astype(m_dtype), anc_pad, precision=_CPREC)
    mB = jnp.einsum("baj,jn->ban", oh_b.astype(m_dtype), anc_pad, precision=_CPREC)
    active = (pen > 0.0).astype(pen.dtype)
    if _stage == "compact":  # perf attribution only
        return pen, mA, mB, fs[0]

    # ---- merged Jacobian, columns x-major (t1 | t2 | n) -------------------
    # Row r of the contact frame contributes the Plücker force vector
    # [x × r; r] at point x; J[n, m] = S_n · W_m with ancestor masks and the
    # a−b relative-velocity subtraction folded in. The contraction dim is 6,
    # which the MXU pads 21x (K 6 -> 128; measured ~6 ms/substep as an
    # einsum), so it is written as 6 broadcast FMAs instead — one fused
    # elementwise kernel producing (B, N, 3A) directly, no (B, N, 6A)
    # intermediate and no separate mask pass.
    Jm = _assemble_jm_batch(
        Sc, x_a, x_b, t1, t2, n,
        mA[:, :, :N].swapaxes(1, 2), mB[:, :, :N].swapaxes(1, 2),
    )

    return ContactSystem(
        Jm=Jm, v_t1=v_t1, v_t2=v_t2, v_n=v_n, pen=pen, active=active,
        t1=t1, t2=t2, n=n, oh_signed=oh_signed,
        x_a=x_a, x_b=x_b, mA=mA, mB=mB,
    )


def _psd_round(W):
    """Round the Gram factor onto the bf16 grid by integer mantissa
    truncation — the PSD-critical preconditioning of the contact LHS.

    The SPD argument for the implicit contact term requires the Gram
    W^T W of ONE well-defined rounded factor. An f32->bf16 `astype` does
    NOT guarantee that on this backend: under --xla_allow_excess_precision
    (set by the axon terminal) XLA may elide the convert on one einsum
    operand and not the other, yielding W_bf16^T W_f32 — not a Gram,
    indefinite by O(10) eigenvalues, NaN Cholesky (observed on v5e;
    optimization_barrier does NOT stop the elision). Masking the low 16
    mantissa bits with integer ops is un-elidable, and because the values
    then sit exactly on the bf16 grid, any further (possibly asymmetric)
    bf16 rounding inside the MXU is the identity — the product is an
    exact Gram either way. On CPU this is skipped (f32 einsums are exact
    and the parity tests compare against the f32 oracle)."""
    if jax.default_backend() != "tpu":
        return W
    Wi = jax.lax.bitcast_convert_type(W, jnp.int32) & jnp.int32(-65536)
    return jax.lax.bitcast_convert_type(Wi, jnp.float32)


def _assemble_jm_batch(Sc, x_a, x_b, t1, t2, n, mA, mB, transposed=False):
    """Merged contact Jacobian from compacted primitives (see the comment
    at the call site). mA/mB are (B, N, A). transposed=False gives
    (B, N, 3A); transposed=True gives (B, 3A, N) — the layout the Gram
    einsum consumes directly (contraction dim second-to-last on both
    operands), which removes a whole-array relayout copy on TPU."""

    def w_merged(x):
        cols = []
        for r in (t1, t2, n):
            cols.append(_cross3(x, r) + r)  # 6-tuple of (B, A): [x×r; r]
        rows = []
        for i in range(6):
            rows.append(jnp.concatenate([cols[0][i], cols[1][i], cols[2][i]], axis=-1))
        return rows  # 6 x (B, 3A)

    Wa = w_merged(x_a)
    Wb = w_merged(x_b)
    if transposed:
        # here mA/mB arrive PRE-TRANSPOSED as (B, A, N) (emitted that way
        # by the mask einsum — no relayout pass)
        mA3 = jnp.concatenate([mA, mA, mA], axis=1)  # (B, 3A, N)
        mB3 = jnp.concatenate([mB, mB, mB], axis=1)
        Ja = sum(Sc[i][:, None, :] * Wa[i][:, :, None] for i in range(6))
        Jb = sum(Sc[i][:, None, :] * Wb[i][:, :, None] for i in range(6))
        return Ja * mA3 - Jb * mB3
    mA3 = jnp.concatenate([mA, mA, mA], axis=-1)  # (B, N, 3A), no relayout
    mB3 = jnp.concatenate([mB, mB, mB], axis=-1)
    Ja = sum(Sc[i][:, :, None] * Wa[i][:, None, :] for i in range(6))
    Jb = sum(Sc[i][:, :, None] * Wb[i][:, None, :] for i in range(6))
    return Ja * mA3 - Jb * mB3


# Dev-only knockout set for performance attribution (scripts/bench_profile
# sets this before tracing to knock pieces out of the substep; never set in
# production code). Members: "mass", "bias", "contacts", "solve".
_DEBUG_SKIP: frozenset = frozenset()


def _physics_substep(model: PhysicsModel, state: PhysicsState, pd_target: jax.Array, body_force=None):
    dt = model.dt
    B = state.batch
    J = model.num_bodies
    N = model.num_dofs
    skip = _DEBUG_SKIP

    frame = forward_kinematics(model, state)
    # shared dynamics pieces (inertial params / motion subspace computed once
    # for CRBA, RNEA, and the contact Jacobians) — component form, see
    # _dyn_params
    Sc = _motion_subspace_comps(model, frame)
    if "mass" in skip:
        M = jnp.broadcast_to(jnp.eye(N) * 10.0, (B, N, N))
    else:
        params = _dyn_params(model, frame)
        M = _mass_matrix_comps(model, params, Sc)
    if "bias" in skip or "mass" in skip:
        C = jnp.zeros((B, N))
    else:
        C = _bias_dispatch(model, frame, state, params, Sc)

    tau_act = pd_actuation(model, state, pd_target, dt)
    tau = jnp.concatenate([jnp.zeros((B, 6)), tau_act], axis=-1)
    if body_force is not None:
        tau = tau + _external_generalized_force(model, frame, Sc, body_force)

    # ---- linearly-implicit contacts (ground plane + self-collision) -------
    # Spring-damper contact evaluated at the END-of-step velocity:
    #   f_n = k*pen - (d + k*dt) * v_n(t+dt),  f_t = -c_t * v_t(t+dt)
    # with c_t = mu*f_n_pred/(|v_t|+eps) (regularized Coulomb, coefficient
    # frozen at the current state). Moving the velocity terms to the LHS
    # (LHS += dt * J diag(c) J^T) makes the stiff contact unconditionally
    # stable in ONE solve. Ground contacts live in the world frame
    # (t1=x, t2=y, n=z); self-collision pairs get a per-contact frame and a
    # relative-velocity Jacobian (see _contact_system).
    if "contacts" in skip:
        cs = None
        Am = model.max_contacts or 1
        pen = jnp.zeros((B, Am))
        active = pen
        c_t = pen
        c_n = pen
    else:
        cs = _contact_system(model, frame, Sc)
        pen, active = cs.pen, cs.active
        Am = pen.shape[1]

    k, d = model.contact_stiffness, model.contact_damping
    # cap the spring term so the steady-state depenetration velocity
    # k*pen/(d + k*dt) never exceeds max_depenetration_velocity (PhysX
    # parity: reference `isaacgym_env.py:22` sets 10 m/s)
    pen_cap = model.max_depenetration_velocity * (d + k * dt) / k
    if cs is not None:
        pen_f = jnp.minimum(pen, pen_cap)
        f_n_pred = jnp.maximum(k * pen_f - d * cs.v_n, 0.0) * active
        v_t_norm = jnp.sqrt(cs.v_t1 * cs.v_t1 + cs.v_t2 * cs.v_t2 + 1e-12)
        c_t = jnp.minimum(
            model.friction * f_n_pred / (v_t_norm + model.contact_vel_eps),
            model.friction_coef_max,
        )
        c_n = (d + k * dt) * active

    # implicit joint damping (stable PD): LHS += dt * Kd, plus contact terms
    kd_full = np.concatenate([np.zeros(6, np.float32), model.kd])
    lhs = M + jnp.asarray(np.diag(dt * kd_full)[None])
    if cs is not None:
        # merged x-major (t1 | t2 | n) implicit coefficients + explicit forces
        coef_m = jnp.concatenate([c_t, c_t, c_n], axis=-1)  # (B, 3A)
        f_expl_m = jnp.concatenate(
            [-c_t * cs.v_t1, -c_t * cs.v_t2, k * pen_f * active - c_n * cs.v_n], axis=-1
        )
        Q_contact = jnp.einsum("bnm,bm->bn", cs.Jm, f_expl_m, precision=_CPREC)
        # Gram-factored implicit term: LHS += W W^T with W = J sqrt(dt c).
        # A Gram matrix of the bf16-rounded factor is exactly PSD under
        # fp32 accumulation, so the Cholesky never sees an indefinite LHS
        # even with stiction coefficients up to friction_coef_max=1e5 —
        # assembling dt*J diag(c) J^T directly in one bf16 pass put ~1%
        # relative error (absolute ~8 at c=1e5) on entries that sit next to
        # O(0.1) mass terms and produced NaN factorizations (the phantom
        # every-7-steps force-resets chased in experiments/pd_hold.py).
        W = _psd_round(cs.Jm * jnp.sqrt(dt * coef_m)[:, None, :])
        lhs = lhs + jnp.einsum("bnm,bkm->bnk", W, W, precision=_CPREC)
    else:
        Q_contact = jnp.zeros((B, N))

    rhs = tau + Q_contact - C

    # SPD solve. On TPU: the Pallas batch-in-lanes Cholesky (exact fp32,
    # 8.3x faster than the recursive-Schur spd_solve at (4096, 75, 75) —
    # 1.2 vs 9.8 ms/solve, experiments/solver_bench.py) because the batch
    # rides the 128-lane dimension with zero padding waste. On CPU (test
    # suite / dryrun): spd_solve — interpret-mode Pallas inside the substep
    # would dominate test wall-time; cross-solver agreement is pinned to
    # ~3e-5 in tests/test_solver.py and the bench's accuracy cross-check.
    if "solve" in skip:
        qacc = rhs * 1e-3
    else:
        solver = model.solver
        if solver == "auto":
            solver = "lanes" if jax.default_backend() == "tpu" else "schur"
        if solver == "lanes":
            qacc = chol_solve_lanes(lhs, rhs)
        else:
            qacc = spd_solve(lhs, rhs, base=24, refine=2)

    v_new = state.vel + dt * qacc
    # hard velocity cap (PhysX articulation parity; see PhysicsModel)
    v_new = jnp.clip(v_new, -model.max_velocity, model.max_velocity)

    # post-solve contact forces for the env's contact buffer (diagnostic)
    if cs is None:
        cbf = jnp.zeros((B, J, 3))
        v_m = None
    else:
        v_m = jnp.concatenate([cs.v_t1, cs.v_t2, cs.v_n], axis=-1)
        v_m_new = v_m + dt * jnp.einsum("bnm,bn->bm", cs.Jm, qacc, precision=_CPREC)
        vt1n, vt2n, vnn = v_m_new[:, :Am], v_m_new[:, Am : 2 * Am], v_m_new[:, 2 * Am :]
        f_t1 = -c_t * vt1n
        f_t2 = -c_t * vt2n
        f_n = jnp.maximum(k * pen_f * active - c_n * vnn, 0.0)

        # per-body aggregation via the signed one-hot matmul (a scatter-add
        # with duplicate indices takes milliseconds on TPU; this is one tiny
        # MXU op). +f on body_a, −f on body_b (ground rows: zero column).
        f_world_w = [
            f_t1 * cs.t1[w] + f_t2 * cs.t2[w] + f_n * cs.n[w] for w in range(3)
        ]  # world components (B, A)
        cbf = jnp.stack(
            [jnp.einsum("baj,ba->bj", cs.oh_signed, fw) for fw in f_world_w], axis=-1
        )  # (B, J, 3)

    # integrate: root position (world), quaternions via exponential map
    root_pos = state.root_pos + dt * v_new[:, 0:3]

    def quat_step(q, omega_local):
        dq = T.exp_map_to_quat(dt * omega_local)
        return T.quat_mul_norm(q, dq)

    root_quat = quat_step(state.joint_quat[:, 0], v_new[:, 3:6])
    joint_omega = v_new[:, 6:].reshape(B, J - 1, 3)
    ball_quat = quat_step(state.joint_quat[:, 1:], joint_omega)
    joint_quat = jnp.concatenate([root_quat[:, None], ball_quat], axis=1)

    new_state = PhysicsState(root_pos=root_pos, joint_quat=joint_quat, vel=v_new)
    # actual actuator torque (with the implicit damping correction) for the
    # power reward (reference `humanoid_phc.py:1295-1303`)
    dof_torque = tau_act - jnp.asarray(model.kd) * dt * qacc[:, 6:]
    info = {"contact_forces": cbf, "dof_torque": dof_torque}
    return new_state, info


def _step_frozen(model: PhysicsModel, state: PhysicsState, pd_target: jax.Array, body_force=None):
    """One control step as `substeps` velocity iterations against a system
    built and FACTORED once (TGS-style sub-iterations).

    FK, the motion subspace, CRBA mass matrix, RNEA bias, the contact set,
    its Jacobian and the implicit LHS are evaluated at the step's initial
    state; each substep only rebuilds the right-hand side (stable-PD torque
    from the integrated pose, explicit contact forces from first-order
    contact-state updates pen += -dt*v_n, v_m += dt*J^T qacc) and reuses
    the Cholesky factor. This mirrors how PhysX runs its solver
    sub-iterations against per-step frozen Jacobians (the reference steps
    PhysX at `substeps: 2`, `isaacgym_env.py:15-27`) and costs one
    dynamics/contact build instead of `substeps`.

    Trade-off vs substep_mode="full": M, C, S and contact geometry lag by
    up to (substeps-1)*dt inside a control step. Signed-depth compaction
    keeps approaching contacts in the frozen set so they can activate
    mid-step through the pen integration.
    """
    dt = model.dt
    B = state.batch
    J = model.num_bodies
    N = model.num_dofs
    skip = _DEBUG_SKIP  # bench_profile attribution knockouts (never set in prod)

    frame = forward_kinematics(model, state)
    Sc = _motion_subspace_comps(model, frame)
    params = _dyn_params(model, frame)
    if "mass" in skip:
        M = jnp.broadcast_to(jnp.eye(N) * 10.0, (B, N, N))
    else:
        M = _mass_matrix_comps(model, params, Sc)
    if "bias" in skip:
        C = jnp.zeros((B, N))
    else:
        C = _bias_dispatch(model, frame, state, params, Sc)

    if "contacts" in skip:
        Am = -(-(model.max_contacts or 1) // 8) * 8
        NPad = -(-N // 8) * 8
        zA = jnp.zeros((B, Am))
        z3 = (zA, zA, zA)
        cs = ContactSystem(
            Jm=jnp.zeros((B, N, 3 * Am)), v_t1=zA, v_t2=zA, v_n=zA, pen=zA,
            active=zA, t1=z3, t2=z3, n=z3,
            oh_signed=jnp.zeros((B, Am, J)),
            x_a=z3, x_b=z3,
            mA=jnp.zeros((B, Am, NPad)), mB=jnp.zeros((B, Am, NPad)),
        )
    else:
        cs = _contact_system(model, frame, Sc)
    pen0, active0 = cs.pen, cs.active
    Am = pen0.shape[1]
    k, d = model.contact_stiffness, model.contact_damping
    Q_ext = (
        _external_generalized_force(model, frame, Sc, body_force)
        if body_force is not None
        else None
    )

    # implicit coefficients frozen at the initial state (as in the full path,
    # including the depenetration-velocity cap and friction-coefficient cap)
    pen_cap = model.max_depenetration_velocity * (d + k * dt) / k
    f_n_pred = jnp.maximum(k * jnp.minimum(pen0, pen_cap) - d * cs.v_n, 0.0) * active0
    v_t_norm = jnp.sqrt(cs.v_t1 * cs.v_t1 + cs.v_t2 * cs.v_t2 + 1e-12)
    c_t = jnp.minimum(
        model.friction * f_n_pred / (v_t_norm + model.contact_vel_eps),
        model.friction_coef_max,
    )
    c_n = (d + k * dt) * active0
    coef_m = jnp.concatenate([c_t, c_t, c_n], axis=-1)  # (B, 3A)

    kd_full = np.concatenate([np.zeros(6, np.float32), model.kd])

    solver = model.solver
    if solver == "auto":
        solver = "lanes" if jax.default_backend() == "tpu" else "schur"

    # Fused whole-substep Pallas kernel (the production lanes path): all
    # `substeps` velocity iterations — PD, contact RHS, both triangular
    # substitutions, pose integration — run in ONE kernel per control step
    # (replacing a ~40-kernel sequential XLA chain; see PERF.md). The
    # legacy loop below remains the oracle path (CPU tests, knockouts).
    if solver == "lanes" and not skip and model.substeps > 0:
        from phc_tpu.physics import fused_step

        # PADDED assembly: the Jacobian/Gram/LHS are built at the kernel's
        # row count NPad directly (masks/Sc carry zero pad rows, the LHS
        # pad diagonal is identity), so no whole-array pad/slice passes
        # sit between the build and the kernel DMA. The Gram runs fp32
        # Precision.HIGH on the f32 Jacobian — measured no slower than the
        # bf16-W path once the W conversion + relayout copies are gone.
        from phc_tpu.physics import lanes_dyn

        NPad = -(-N // 8) * 8
        Sc_p = tuple(jnp.pad(s, ((0, 0), (0, NPad - N))) for s in Sc)
        Jm_p = _assemble_jm_batch(
            Sc_p, cs.x_a, cs.x_b, cs.t1, cs.t2, cs.n, cs.mA, cs.mB,
            transposed=True,
        )  # (B, 3A, NPad) — Gram-operand layout, no relayout copy
        # single-pass bf16 Gram (PSD by construction: Gram of the rounded
        # factor, fp32 accumulate — see _physics_substep); fp32 HIGH
        # measures ~0.9 ms/ctrl-step slower. Explicit bf16 only on TPU (it
        # matches what DEFAULT-precision MXU einsums already did to the
        # operands); CPU stays f32 so the fused path is bit-comparable
        # with the legacy loop there (parity test).
        W = _psd_round(Jm_p * jnp.sqrt(dt * coef_m)[:, :, None])
        G = jnp.einsum("bmn,bmk->bnk", W, W, precision=_CPREC).astype(jnp.float32)
        # M + armature + dt*Kd diag emitted DIRECTLY in the factor's lanes
        # layout by the combined mass+bias kernel (the XLA M/C built above
        # are dead code on this path); the Gram transpose fuses into the add
        C_lanes, M_lanes = lanes_dyn.mass_bias_lanes(model, frame, state)
        lhs_lanes = M_lanes + jnp.transpose(G, (1, 2, 0))
        # bf16 Jacobian for the substep kernel ONLY (TPU): halves the
        # biggest per-step HBM tensor (157 -> 79 MB at B=4096) across its
        # assembly write and the kernel's DMA read. The kernel's contact
        # matvecs (Q = J^T f, v_m += dt J qacc) run HIGHEST-precision dots
        # with fp32 accumulation, so the only loss is ~0.4% on Jacobian
        # entries — validated behaviorally by the trained-policy eval
        # probe. The Gram factor W stays derived from the f32 Jm (its PSD
        # argument needs the psd_round bf16-grid factor, engine._psd_round).
        # CPU keeps f32 so the fused-vs-legacy parity test stays exact.
        Jm_k = Jm_p.astype(jnp.bfloat16) if jax.default_backend() == "tpu" else Jm_p
        root_pos_n, joint_quat_n, vel_n, dof_torque, f_m = (
            fused_step.frozen_substeps_fused(
                model, state.root_pos, state.joint_quat, state.vel,
                lhs_lanes, Jm_k, C_lanes, c_t, c_n, pen0,
                cs.v_t1, cs.v_t2, cs.v_n, pd_target, Q_ext,
                lanes_inputs=True,
                jm_transposed=True,  # Jm_p is the (B, 3A, NPad) Gram layout
            )
        )
        f_t1 = f_m[:, :Am]
        f_t2 = f_m[:, Am : 2 * Am]
        f_n = f_m[:, 2 * Am :]
        f_world_w = [
            f_t1 * cs.t1[w] + f_t2 * cs.t2[w] + f_n * cs.n[w] for w in range(3)
        ]
        cbf = jnp.stack(
            [jnp.einsum("baj,ba->bj", cs.oh_signed, fw) for fw in f_world_w], axis=-1
        )
        new_state = PhysicsState(
            root_pos=root_pos_n, joint_quat=joint_quat_n, vel=vel_n
        )
        return new_state, {"contact_forces": cbf, "dof_torque": dof_torque}

    lhs = M + jnp.asarray(np.diag(dt * kd_full)[None])
    # Gram-factored SPD assembly (see _physics_substep): exactly PSD under
    # bf16 rounding, unlike the direct dt*J diag(c) J^T einsum.
    if "gram" not in skip:
        W = _psd_round(cs.Jm * jnp.sqrt(dt * coef_m)[:, None, :])
        lhs = lhs + jnp.einsum("bnm,bkm->bnk", W, W, precision=_CPREC)

    if "solve" in skip:
        resolve = lambda rhs: rhs * 0.01
    elif solver == "lanes":
        Lt = chol_factor_lanes(lhs)
        resolve = lambda rhs: chol_resolve_lanes(Lt, rhs)
    else:
        Ainv = spd_inverse(lhs, base=24)

        def resolve(rhs):
            x = jnp.einsum("...ij,...j->...i", Ainv, rhs, precision=_PREC)
            for _ in range(2):
                r = rhs - jnp.einsum("...ij,...j->...i", lhs, x, precision=_PREC)
                x = x + jnp.einsum("...ij,...j->...i", Ainv, r, precision=_PREC)
            return x

    kp = jnp.asarray(model.kp)
    kd = jnp.asarray(model.kd)

    root_pos = state.root_pos
    joint_quat = state.joint_quat
    vel = state.vel
    pen_i = pen0
    v_m = jnp.concatenate([cs.v_t1, cs.v_t2, cs.v_n], axis=-1)  # (B, 3A)

    qacc = None
    tau_act = None
    for _ in range(model.substeps):
        # stable-PD torque from the CURRENT integrated pose (exact exp map)
        q = T.quat_to_exp_map(joint_quat[:, 1:]).reshape(B, 3 * (J - 1))
        qd = vel[:, 6:]
        tau_act = kp * (pd_target - q - dt * qd) - kd * qd
        tau = jnp.concatenate([jnp.zeros((B, 6)), tau_act], axis=-1)
        if body_force is not None:
            tau = tau + Q_ext

        v_t1_i = v_m[:, :Am]
        v_t2_i = v_m[:, Am : 2 * Am]
        v_n_i = v_m[:, 2 * Am :]
        active_i = (pen_i > 0.0).astype(pen_i.dtype)
        pen_fi = jnp.minimum(pen_i, pen_cap)
        f_expl_m = jnp.concatenate(
            [-c_t * v_t1_i, -c_t * v_t2_i, k * pen_fi * active_i - c_n * v_n_i], axis=-1
        )
        if "qcontact" in skip:
            Q_contact = jnp.zeros((B, N))
        else:
            Q_contact = jnp.einsum("bnm,bm->bn", cs.Jm, f_expl_m, precision=_CPREC)

        rhs = tau + Q_contact - C
        qacc = resolve(rhs)

        vel = vel + dt * qacc
        # hard velocity cap (PhysX articulation parity; see PhysicsModel)
        vel = jnp.clip(vel, -model.max_velocity, model.max_velocity)
        # first-order contact-state update against the frozen Jacobian
        # (separate knockout key from 'qcontact' so bench_profile can
        # attribute the force matvec and the v_m integration individually)
        if "vmupdate" not in skip:
            v_m = v_m + dt * jnp.einsum("bnm,bn->bm", cs.Jm, qacc, precision=_CPREC)
        pen_i = pen_i - dt * v_m[:, 2 * Am :]

        # integrate pose
        root_pos = root_pos + dt * vel[:, 0:3]
        dq_root = T.exp_map_to_quat(dt * vel[:, 3:6])
        root_quat = T.quat_mul_norm(joint_quat[:, 0], dq_root)
        joint_omega = vel[:, 6:].reshape(B, J - 1, 3)
        ball_quat = T.quat_mul_norm(joint_quat[:, 1:], T.exp_map_to_quat(dt * joint_omega))
        joint_quat = jnp.concatenate([root_quat[:, None], ball_quat], axis=1)

    # diagnostics from the last substep (same reconstruction as the full path)
    vt1n, vt2n, vnn = v_m[:, :Am], v_m[:, Am : 2 * Am], v_m[:, 2 * Am :]
    f_t1 = -c_t * vt1n
    f_t2 = -c_t * vt2n
    f_n = jnp.maximum(k * jnp.minimum(pen_i, pen_cap) * (pen_i > 0.0) - c_n * vnn, 0.0)
    f_world_w = [f_t1 * cs.t1[w] + f_t2 * cs.t2[w] + f_n * cs.n[w] for w in range(3)]
    cbf = jnp.stack(
        [jnp.einsum("baj,ba->bj", cs.oh_signed, fw) for fw in f_world_w], axis=-1
    )
    dof_torque = tau_act - kd * dt * qacc[:, 6:]

    new_state = PhysicsState(root_pos=root_pos, joint_quat=joint_quat, vel=vel)
    return new_state, {"contact_forces": cbf, "dof_torque": dof_torque}


# ---------------------------------------------------------------------------
# State construction
# ---------------------------------------------------------------------------


def state_from_parts(
    root_pos: jax.Array,
    root_rot: jax.Array,
    dof_pos: jax.Array,
    root_vel: jax.Array,
    root_ang_vel_world: jax.Array,
    dof_vel: jax.Array,
) -> PhysicsState:
    """Build a PhysicsState from env/motion-lib quantities.

    Mirrors reference `_set_env_state` (`humanoid_phc.py:899-918`): root
    angular velocity arrives world-frame (Isaac convention) and is converted
    to the body frame; dof_pos is exp-map (B, 69); dof_vel is the joint
    angular velocity in child frames (B, 69) — the motion library convention.
    """
    B = root_pos.shape[0]
    J1 = dof_pos.shape[-1] // 3
    ball_quat = T.exp_map_to_quat(dof_pos.reshape(B, J1, 3))
    joint_quat = jnp.concatenate([root_rot[:, None], ball_quat], axis=1)
    ang_body = T.quat_rotate(T.quat_conjugate(root_rot), root_ang_vel_world)
    vel = jnp.concatenate([root_vel, ang_body, dof_vel], axis=-1)
    return PhysicsState(root_pos=root_pos, joint_quat=joint_quat, vel=vel)


def default_state(model: PhysicsModel, batch: int, height: float = 0.89) -> PhysicsState:
    J = model.num_bodies
    root_pos = jnp.tile(jnp.array([0.0, 0.0, height]), (batch, 1))
    joint_quat = jnp.tile(T.quat_identity((J,)), (batch, 1, 1))
    vel = jnp.zeros((batch, model.num_dofs))
    return PhysicsState(root_pos=root_pos, joint_quat=joint_quat, vel=vel)
