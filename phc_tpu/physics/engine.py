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

from phc_tpu import transforms as T
from phc_tpu.physics.model import PhysicsModel
from phc_tpu.physics.solver import spd_solve


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


def mass_matrix(model: PhysicsModel, frame: BodyFrame) -> jax.Array:
    """Joint-space mass matrix via world-frame CRBA. (B, N, N)."""
    I_sp = _spatial_inertia_world(model, frame)
    S = _motion_subspace(model, frame)
    return _mass_matrix_from(model, I_sp, S)


def _mass_matrix_from(model: PhysicsModel, I_sp: jax.Array, S: jax.Array) -> jax.Array:
    Ic = _composite_inertia(model, I_sp)

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
    I_sp = _spatial_inertia_world(model, frame)
    S = _motion_subspace(model, frame)
    return _bias_from(model, frame, state, I_sp, S)


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


_CAND_CACHE: dict = {}


def _candidate_tables(model: PhysicsModel):
    """Static per-candidate tables over [ground points ++ self pairs]:
    owning bodies (body_b = −1 for the ground plane) and per-dof ancestor
    masks (N,) used to zero non-ancestor Jacobian rows."""
    key = id(model)
    hit = _CAND_CACHE.get(key)
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
    _CAND_CACHE[key] = out
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


def step(model: PhysicsModel, state: PhysicsState, pd_target: jax.Array):
    """One control step = `model.substeps` physics substeps (lax.scan).

    Returns (new_state, info dict with contact forces and dof torques of the
    last substep).
    """

    def substep(s, _):
        s2, info = _physics_substep(model, s, pd_target)
        return s2, info

    state, infos = jax.lax.scan(substep, state, None, length=model.substeps)
    info = jax.tree_util.tree_map(lambda x: x[-1], infos)
    return state, info


def _contact_system(model: PhysicsModel, frame: BodyFrame, S: jax.Array):
    """Candidate narrow phases -> top-k compaction -> contact-frame
    relative-velocity Jacobians. Returns (Jc (B,N,A,3), v_cf (B,A,3),
    pen (B,A), active (B,A), R_all (B,A,3,3), body_a (B,A), body_b (B,A)).

    Contact compaction: every candidate is evaluated by the cheap
    elementwise narrow phases, but only the model.max_contacts deepest-
    penetrating candidates per env get Jacobian rows and LHS terms
    (lax.top_k + gather). Inactive slots carry zero coefficients, so the
    result is EXACT whenever <= max_contacts candidates are active —
    5x less Jacobian/LHS work than the dense assembly at 310 candidates.
    """
    B = frame.rot.shape[0]
    N = S.shape[1]
    points, v_point, pen_g, act_g = contact_kinematics(model, frame)
    P = model.contact_body.shape[0]
    K = model.pair_body.shape[0]

    eyeR = jnp.broadcast_to(jnp.eye(3), (B, P, 3, 3))
    if K:
        x_a_s, x_b_s, v_rel_s, R_s, pen_s, act_s = self_contact_kinematics(model, frame)
        x_a = jnp.concatenate([points, x_a_s], axis=1)
        x_b = jnp.concatenate([jnp.zeros_like(points), x_b_s], axis=1)
        v_rel = jnp.concatenate([v_point, v_rel_s], axis=1)
        R_all = jnp.concatenate([eyeR, R_s], axis=1)
        pen = jnp.concatenate([pen_g, pen_s], axis=1)
        active = jnp.concatenate([act_g, act_s], axis=1)
    else:
        x_a, x_b, v_rel, R_all, pen, active = (
            points, jnp.zeros_like(points), v_point, eyeR, pen_g, act_g,
        )

    body_a_np, body_b_np, anc_a_np, anc_b_np = _candidate_tables(model)
    Ctot = P + K
    A = model.max_contacts
    if A and A < Ctot:
        _, idx = jax.lax.top_k(pen, A)  # (B, A)

        def _g(arr):
            ix = idx.reshape(idx.shape + (1,) * (arr.ndim - 2))
            return jnp.take_along_axis(arr, ix, axis=1)

        x_a, x_b, v_rel, R_all = _g(x_a), _g(x_b), _g(v_rel), _g(R_all)
        pen = jnp.take_along_axis(pen, idx, axis=1)
        active = jnp.take_along_axis(active, idx, axis=1)
        anc_a = jnp.asarray(anc_a_np)[idx]  # (B, A, N)
        anc_b = jnp.asarray(anc_b_np)[idx]
        body_a = jnp.asarray(body_a_np)[idx]  # (B, A)
        body_b = jnp.asarray(body_b_np)[idx]
    else:
        anc_a = jnp.broadcast_to(jnp.asarray(anc_a_np), (B, Ctot, N))
        anc_b = jnp.broadcast_to(jnp.asarray(anc_b_np), (B, Ctot, N))
        body_a = jnp.broadcast_to(jnp.asarray(body_a_np), (B, Ctot))
        body_b = jnp.broadcast_to(jnp.asarray(body_b_np), (B, Ctot))

    # world-frame relative-velocity Jacobian rows: J_a(x_a) − J_b(x_b),
    # each masked to the ancestors of its owning body (ground: mask_b = 0)
    def _pt_jac(x, anc):
        eye3 = jnp.eye(3)
        pce = jnp.cross(x[..., None, :], eye3)  # (B, A, 3, 3)
        W = jnp.concatenate([pce, jnp.broadcast_to(eye3, pce.shape)], axis=-1)
        Jp = jnp.einsum("bni,baxi->bnax", S, W, precision=_PREC)  # (B, N, A, 3)
        return Jp * jnp.swapaxes(anc, 1, 2)[..., None]

    Jw = _pt_jac(x_a, anc_a) - _pt_jac(x_b, anc_b)
    Jc = jnp.einsum("bnaw,baxw->bnax", Jw, R_all, precision=_PREC)  # contact frame
    v_cf = jnp.einsum("baxw,baw->bax", R_all, v_rel, precision=_PREC)

    return Jc, v_cf, pen, active, R_all, body_a, body_b


def _physics_substep(model: PhysicsModel, state: PhysicsState, pd_target: jax.Array):
    dt = model.dt
    B = state.batch
    J = model.num_bodies
    N = model.num_dofs

    frame = forward_kinematics(model, state)
    # shared dynamics pieces (spatial inertias / motion subspace computed once
    # for CRBA, RNEA, and the contact Jacobians)
    I_sp = _spatial_inertia_world(model, frame)
    S = _motion_subspace(model, frame)
    M = _mass_matrix_from(model, I_sp, S)
    C = _bias_from(model, frame, state, I_sp, S)

    tau_act = pd_actuation(model, state, pd_target, dt)
    tau = jnp.concatenate([jnp.zeros((B, 6)), tau_act], axis=-1)

    # ---- linearly-implicit contacts (ground plane + self-collision) -------
    # Spring-damper contact evaluated at the END-of-step velocity:
    #   f_n = k*pen - (d + k*dt) * v_n(t+dt),  f_t = -c_t * v_t(t+dt)
    # with c_t = mu*f_n_pred/(|v_t|+eps) (regularized Coulomb, coefficient
    # frozen at the current state). Moving the velocity terms to the LHS
    # (LHS += dt * J diag(c) J^T) makes the stiff contact unconditionally
    # stable in ONE solve. Ground contacts live in the world frame
    # (t1=x, t2=y, n=z); self-collision pairs get a per-contact frame and a
    # relative-velocity Jacobian (see _contact_system).
    Jc, v_cf, pen, active, R_all, body_a, body_b = _contact_system(model, frame, S)

    k, d = model.contact_stiffness, model.contact_damping
    f_n_pred = jnp.maximum(k * pen - d * v_cf[..., 2], 0.0) * active
    v_t_norm = jnp.linalg.norm(v_cf[..., :2], axis=-1)
    c_t = model.friction * f_n_pred / (v_t_norm + model.contact_vel_eps)
    c_n = (d + k * dt) * active

    # per-(contact, axis) implicit viscous coefficients
    coef = jnp.stack([c_t, c_t, c_n], axis=-1)  # (B, P+K, 3)

    # explicit RHS force at current velocities (contact frame)
    f_expl = jnp.concatenate(
        [
            -c_t[..., None] * v_cf[..., :2],
            (k * pen * active - c_n * v_cf[..., 2])[..., None],
        ],
        axis=-1,
    )  # (B, P+K, 3)
    Q_contact = jnp.einsum("bnpa,bpa->bn", Jc, f_expl, precision=_PREC)

    # implicit joint damping (stable PD): LHS += dt * Kd, plus contact terms
    kd_full = jnp.concatenate([jnp.zeros(6), jnp.asarray(model.kd)])
    lhs = M + jnp.diag(dt * kd_full)[None]
    lhs = lhs + dt * jnp.einsum("bnpa,bpa,bmpa->bnm", Jc, coef, Jc, precision=_PREC)

    rhs = tau + Q_contact - C

    # MXU-friendly SPD solve (recursive Schur block inverse + iterative
    # refinement): ~5x faster than XLA's batched cholesky at (4096, 75, 75)
    # and matches its accuracy class (see physics/solver.py, tests).
    qacc = spd_solve(lhs, rhs, base=24, refine=2)

    v_new = state.vel + dt * qacc

    # post-solve contact forces for the env's contact buffer (diagnostic)
    v_cf_new = v_cf + dt * jnp.einsum("bnpa,bn->bpa", Jc, qacc, precision=_PREC)
    f_post = jnp.concatenate(
        [
            -c_t[..., None] * v_cf_new[..., :2],
            jnp.maximum(k * pen * active - c_n * v_cf_new[..., 2], 0.0)[..., None],
        ],
        axis=-1,
    )
    # per-body aggregation via signed one-hot matmul over the (dynamic)
    # selected contacts (a scatter-add with duplicate indices takes
    # milliseconds on TPU; this is one tiny MXU op). +f on body_a, −f on
    # body_b (ground rows have body_b = −1, which never matches).
    f_world = jnp.einsum("baxw,bax->baw", R_all, f_post, precision=_PREC)
    jb = jnp.arange(model.num_bodies)
    onehot = (jb[None, :, None] == body_a[:, None, :]).astype(f_post.dtype) - (
        jb[None, :, None] == body_b[:, None, :]
    ).astype(f_post.dtype)
    cbf = jnp.einsum("bja,baw->bjw", onehot, f_world)

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
