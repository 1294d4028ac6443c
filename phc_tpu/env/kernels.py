"""Observation / reward / termination kernels for the PHC imitation task.

Functional JAX ports of the reference's jit-scripted kernels
(`/root/reference/puffer_phc/envs/common.py:23-364`). Each function is pure,
batched over envs, and designed to fuse into the surrounding jitted step:
no reshape-to-flat-and-back dance (the reference flattens (B, J, d) to
(B*J, d) for every op because torch.jit needs 2D; jnp broadcasting keeps the
natural shapes and lets XLA fuse the whole obs pipeline).

All default flags follow the reference config: upright start, local root
obs, root height obs, no shape/limb-weight obs (`config.py:39-70,106-107`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from phc_tpu import transforms as T


def remove_base_rot(quat: jax.Array) -> jax.Array:
    """Undo the non-upright asset's base rotation (common.py:16-19): used by
    every obs kernel when the skeleton does NOT have an upright T-pose."""
    base = jnp.asarray([0.5, 0.5, 0.5, 0.5], quat.dtype)
    return T.quat_mul(quat, jnp.broadcast_to(T.quat_conjugate(base), quat.shape))


def compute_self_obs(
    body_pos: jax.Array,  # (B, J, 3)
    body_rot: jax.Array,  # (B, J, 4)
    body_vel: jax.Array,  # (B, J, 3)
    body_ang_vel: jax.Array,  # (B, J, 3)
    root_height_obs: bool = True,
    local_root_obs: bool = True,
    upright: bool = True,
    shape_params: jax.Array | None = None,
) -> jax.Array:
    """Heading-local proprioceptive obs, (B, [1 +] J*15 - 3) = (B, 358) for SMPL.

    Port of `compute_humanoid_observations_smpl_max` (common.py:23-103); the
    flags mirror the reference's. local_root_obs=False overrides the root's
    6d rotation obs with the global (non-heading-local) rotation (:77-79);
    upright=False removes the asset base rotation first (:41-42);
    shape_params (B, 11) appends the SMPL shape vector, the reference's
    has_smpl_params branch (common.py:96-97) — None (parity default) omits
    it, matching the fork's constant has_shape_obs=False.
    """
    root_pos = body_pos[:, 0]
    root_rot = body_rot[:, 0]
    root_h = root_pos[:, 2:3]
    if not upright:
        root_rot = remove_base_rot(root_rot)

    heading_inv = T.calc_heading_quat_inv(root_rot)  # (B, 4)
    hi = heading_inv[:, None, :]  # broadcast over bodies

    local_body_pos = T.quat_rotate(hi, body_pos - root_pos[:, None, :])
    local_body_pos = local_body_pos.reshape(body_pos.shape[0], -1)[:, 3:]  # drop root

    local_body_rot = T.quat_mul(hi, body_rot)
    local_body_rot_obs = T.quat_to_tan_norm(local_body_rot)
    if not local_root_obs:
        root_rot_obs = T.quat_to_tan_norm(root_rot)
        local_body_rot_obs = local_body_rot_obs.at[:, 0].set(root_rot_obs)
    local_body_rot_obs = local_body_rot_obs.reshape(body_rot.shape[0], -1)

    local_body_vel = T.quat_rotate(hi, body_vel).reshape(body_vel.shape[0], -1)
    local_body_ang_vel = T.quat_rotate(hi, body_ang_vel).reshape(body_ang_vel.shape[0], -1)

    parts = []
    if root_height_obs:
        parts.append(root_h)
    parts += [local_body_pos, local_body_rot_obs, local_body_vel, local_body_ang_vel]
    if shape_params is not None:
        parts.append(shape_params)
    return jnp.concatenate(parts, axis=-1)


def compute_imitation_obs(
    root_pos: jax.Array,  # (B, 3)
    root_rot: jax.Array,  # (B, 4)
    body_pos: jax.Array,  # (B, J, 3)
    body_rot: jax.Array,  # (B, J, 4)
    body_vel: jax.Array,  # (B, J, 3)
    body_ang_vel: jax.Array,  # (B, J, 3)
    ref_body_pos: jax.Array,  # (B, J, 3)
    ref_body_rot: jax.Array,  # (B, J, 4)
    ref_body_vel: jax.Array,  # (B, J, 3)
    ref_body_ang_vel: jax.Array,  # (B, J, 3)
) -> jax.Array:
    """Imitation-difference task obs, (B, J*24) = (B, 576) for SMPL.

    Port of `compute_imitation_observations_v6` (common.py:107-176) with
    time_steps=1 (the only value the reference env uses,
    `humanoid_phc.py:1098-1112`). Concatenation order matches: [diff_pos,
    diff_rot(6d), diff_vel, diff_ang_vel, local_ref_pos, local_ref_rot(6d)].
    """
    B, J, _ = body_pos.shape
    heading_inv = T.calc_heading_quat_inv(root_rot)[:, None, :]
    heading = T.calc_heading_quat(root_rot)[:, None, :]

    diff_pos = T.quat_rotate(heading_inv, ref_body_pos - body_pos)

    diff_rot_g = T.quat_mul(ref_body_rot, T.quat_conjugate(body_rot))
    diff_rot = T.quat_mul(T.quat_mul(heading_inv, diff_rot_g), heading)  # change of basis
    diff_rot_obs = T.quat_to_tan_norm(diff_rot)

    diff_vel = T.quat_rotate(heading_inv, ref_body_vel - body_vel)
    diff_ang_vel = T.quat_rotate(heading_inv, ref_body_ang_vel - body_ang_vel)

    local_ref_pos = T.quat_rotate(heading_inv, ref_body_pos - root_pos[:, None, :])
    local_ref_rot = T.quat_to_tan_norm(T.quat_mul(heading_inv, ref_body_rot))

    return jnp.concatenate(
        [
            diff_pos.reshape(B, -1),
            diff_rot_obs.reshape(B, -1),
            diff_vel.reshape(B, -1),
            diff_ang_vel.reshape(B, -1),
            local_ref_pos.reshape(B, -1),
            local_ref_rot.reshape(B, -1),
        ],
        axis=-1,
    )


def dof_to_obs(dof_pos: jax.Array) -> jax.Array:
    """Exp-map dof coords -> 6D tan-norm per joint (common.py:179-189)."""
    B = dof_pos.shape[0]
    q = T.exp_map_to_quat(dof_pos.reshape(B, -1, 3))
    return T.quat_to_tan_norm(q).reshape(B, -1)


def compute_amp_obs(
    root_pos: jax.Array,  # (B, 3)
    root_rot: jax.Array,  # (B, 4)
    root_vel: jax.Array,  # (B, 3)
    root_ang_vel: jax.Array,  # (B, 3)
    dof_pos: jax.Array,  # (B, 69)
    dof_vel: jax.Array,  # (B, 69)
    key_body_pos: jax.Array,  # (B, K, 3)
    dof_subset: jax.Array,  # (D,) int32 indices into the 69 dofs
    root_height_obs: bool = True,
    upright: bool = True,
) -> jax.Array:
    """Single-frame AMP discriminator obs, (B, 196) with the default subset.

    Port of `build_amp_observations_smpl` (common.py:193-267) with the
    reference's default flags (local_root_obs=True, no shape/limb obs).
    root_height_obs mirrors `cfg.amp_root_height_obs`
    (`humanoid_phc.py:1205`); pass dof_subset=arange(69) for
    has_dof_subset=False (common.py:244). Layout: [root_h(1 if enabled),
    root_rot 6d(6), local_root_vel(3), local_root_ang_vel(3),
    dof_obs(6/joint), dof_vel(subset), local_key_pos(K*3)].
    """
    B = root_pos.shape[0]
    root_h = root_pos[:, 2:3]
    if not upright:
        root_rot = remove_base_rot(root_rot)
    heading_inv = T.calc_heading_quat_inv(root_rot)

    root_rot_obs = T.quat_to_tan_norm(T.quat_mul(heading_inv, root_rot))
    local_root_vel = T.quat_rotate(heading_inv, root_vel)
    local_root_ang_vel = T.quat_rotate(heading_inv, root_ang_vel)

    local_key = T.quat_rotate(heading_inv[:, None, :], key_body_pos - root_pos[:, None, :])

    dof_pos_s = dof_pos[:, dof_subset]
    dof_vel_s = dof_vel[:, dof_subset]
    dof_obs = dof_to_obs(dof_pos_s)

    parts = [root_h] if root_height_obs else []
    parts += [
        root_rot_obs,
        local_root_vel,
        local_root_ang_vel,
        dof_obs,
        dof_vel_s,
        local_key.reshape(B, -1),
    ]
    return jnp.concatenate(parts, axis=-1)


def compute_imitation_reward(
    body_pos: jax.Array,
    body_rot: jax.Array,
    body_vel: jax.Array,
    body_ang_vel: jax.Array,
    ref_body_pos: jax.Array,
    ref_body_rot: jax.Array,
    ref_body_vel: jax.Array,
    ref_body_ang_vel: jax.Array,
    k_pos: float = 100.0,
    k_rot: float = 10.0,
    k_vel: float = 0.1,
    k_ang_vel: float = 0.1,
    w_pos: float = 0.5,
    w_rot: float = 0.3,
    w_vel: float = 0.1,
    w_ang_vel: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """4-term exponential imitation reward (common.py:270-322).

    Defaults are the CARBS-swept values from `config.py:23-37`.
    Returns (reward (B,), raw components (B, 4)).
    """
    pos_mse = jnp.mean((ref_body_pos - body_pos) ** 2, axis=(-1, -2))
    r_pos = jnp.exp(-k_pos * pos_mse)

    diff_rot = T.quat_mul(ref_body_rot, T.quat_conjugate(body_rot))
    angle, _ = T.quat_to_angle_axis(diff_rot)
    r_rot = jnp.exp(-k_rot * jnp.mean(angle**2, axis=-1))

    vel_mse = jnp.mean((ref_body_vel - body_vel) ** 2, axis=(-1, -2))
    r_vel = jnp.exp(-k_vel * vel_mse)

    ang_mse = jnp.mean((ref_body_ang_vel - body_ang_vel) ** 2, axis=(-1, -2))
    r_ang = jnp.exp(-k_ang_vel * ang_mse)

    reward = w_pos * r_pos + w_rot * r_rot + w_vel * r_vel + w_ang_vel * r_ang
    return reward, jnp.stack([r_pos, r_rot, r_vel, r_ang], axis=-1)


def compute_power_reward(
    dof_torque: jax.Array, dof_vel: jax.Array, progress: jax.Array, coef: float = 0.0005
) -> jax.Array:
    """Energy penalty, zeroed for the first 3 steps after reset
    (`humanoid_phc.py:1295-1303`)."""
    power = jnp.sum(jnp.abs(dof_torque * dof_vel), axis=-1)
    reward = -coef * power
    return jnp.where(progress <= 3, 0.0, reward)


def compute_im_reset(
    body_pos: jax.Array,  # (B, Jr, 3) tracked subset
    ref_body_pos: jax.Array,  # (B, Jr, 3)
    pass_time: jax.Array,  # (B,) bool — motion exhausted
    progress: jax.Array,  # (B,) int steps since reset
    termination_distance: jax.Array,  # scalar or (Jr,)
    use_mean: bool,
    enable_early_termination: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fall detection + episode end (common.py:325-364).

    use_mean=True (eval): terminate when the MEAN body deviation exceeds the
    threshold; use_mean=False (train): when ANY body deviates. Termination is
    suppressed for the first step after reset (progress > 1).
    Returns (reset (B,) bool, terminated (B,) bool).
    """
    dist = jnp.linalg.norm(body_pos - ref_body_pos, axis=-1)  # (B, Jr)
    if use_mean:
        has_fallen = jnp.mean(dist, axis=-1) > jnp.reshape(termination_distance, (-1,))[0]
    else:
        has_fallen = jnp.any(dist > termination_distance, axis=-1)
    if not enable_early_termination:
        has_fallen = jnp.zeros_like(has_fallen)
    terminated = has_fallen & (progress > 1)
    reset = pass_time | terminated
    return reset, terminated
