"""Tests for obs/reward/termination kernels: dimensions and invariances.

The reference asserts obs==934 at runtime (`humanoid_phc.py:467`); here the
layout contract (358 self + 576 imitation + 196/step AMP) is tested
directly, plus physical invariances (heading-frame independence, perfect-
tracking reward == 1, termination thresholds).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

from phc_tpu import body_sets
from phc_tpu import transforms as T
from phc_tpu.env import kernels

B, J = 4, 24
RNG = np.random.default_rng(0)


def rand_state(b=B):
    pos = RNG.normal(size=(b, J, 3)).astype(np.float32)
    pos[..., 2] += 1.0
    rot = sRot.random(b * J, random_state=7).as_quat().reshape(b, J, 4).astype(np.float32)
    vel = RNG.normal(size=(b, J, 3)).astype(np.float32)
    ang = RNG.normal(size=(b, J, 3)).astype(np.float32)
    return jnp.array(pos), jnp.array(rot), jnp.array(vel), jnp.array(ang)


def test_self_obs_dim_358():
    pos, rot, vel, ang = rand_state()
    obs = kernels.compute_self_obs(pos, rot, vel, ang)
    assert obs.shape == (B, 1 + J * 15 - 3) == (B, 358)


def test_imitation_obs_dim_576():
    pos, rot, vel, ang = rand_state()
    rpos, rrot, rvel, rang = rand_state()
    obs = kernels.compute_imitation_obs(pos[:, 0], rot[:, 0], pos, rot, vel, ang, rpos, rrot, rvel, rang)
    assert obs.shape == (B, J * 24) == (B, 576)


def test_total_obs_is_934():
    assert 358 + 576 == 934  # the reference runtime assert humanoid_phc.py:467


def test_amp_obs_dim_196():
    pos, rot, vel, ang = rand_state()
    dof_pos = jnp.array(RNG.normal(size=(B, 69)).astype(np.float32))
    dof_vel = jnp.array(RNG.normal(size=(B, 69)).astype(np.float32))
    key_pos = pos[:, jnp.asarray(body_sets.body_ids(body_sets.KEY_BODIES))]
    sub = jnp.asarray(body_sets.dof_subset_indices())
    obs = kernels.compute_amp_obs(pos[:, 0], rot[:, 0], vel[:, 0], ang[:, 0], dof_pos, dof_vel, key_pos, sub)
    # 13 + 19*6 + 57 + 12 = 196 (reference humanoid_phc.py:469-478)
    assert obs.shape == (B, 196)


def test_self_obs_invariant_to_heading_and_translation():
    pos, rot, vel, ang = rand_state()
    obs0 = kernels.compute_self_obs(pos, rot, vel, ang, root_height_obs=False)

    # rotate everything about world z and translate in xy
    yaw = 1.1
    q = jnp.array([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)], jnp.float32)
    shift = jnp.array([3.0, -2.0, 0.0])
    pos2 = T.quat_rotate(q[None, None], pos) + shift
    rot2 = T.quat_mul(jnp.broadcast_to(q, rot.shape), rot)
    vel2 = T.quat_rotate(q[None, None], vel)
    ang2 = T.quat_rotate(q[None, None], ang)
    obs1 = kernels.compute_self_obs(pos2, rot2, vel2, ang2, root_height_obs=False)
    np.testing.assert_allclose(np.asarray(obs0), np.asarray(obs1), atol=2e-4)


def test_imitation_reward_perfect_tracking_is_one():
    pos, rot, vel, ang = rand_state()
    r, raw = kernels.compute_imitation_reward(pos, rot, vel, ang, pos, rot, vel, ang)
    np.testing.assert_allclose(np.asarray(r), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw), 1.0, atol=1e-5)


def test_imitation_reward_decreases_with_error():
    pos, rot, vel, ang = rand_state()
    r0, _ = kernels.compute_imitation_reward(pos, rot, vel, ang, pos, rot, vel, ang)
    r1, raw = kernels.compute_imitation_reward(pos + 0.05, rot, vel, ang, pos, rot, vel, ang)
    assert np.all(np.asarray(r1) < np.asarray(r0))
    # only the position component moved
    np.testing.assert_allclose(np.asarray(raw[:, 1:]), 1.0, atol=1e-5)


def test_power_reward_masked_first_steps():
    tq = jnp.ones((B, 69))
    dv = jnp.ones((B, 69))
    prog = jnp.array([0, 3, 4, 100])
    r = np.asarray(kernels.compute_power_reward(tq, dv, prog, coef=0.0005))
    assert r[0] == 0 and r[1] == 0
    np.testing.assert_allclose(r[2:], -0.0005 * 69, rtol=1e-5)


def test_im_reset_any_vs_mean():
    pos = jnp.zeros((3, 5, 3))
    ref = pos.at[0, 2].add(jnp.array([0.3, 0, 0]))  # env 0: one body off by 0.3
    ref = ref.at[1].add(0.3)  # env 1: all bodies off by 0.3 in norm ~0.52
    prog = jnp.array([10, 10, 10])
    no_pass = jnp.zeros(3, bool)

    # train mode (any body > 0.25): envs 0 and 1 terminate
    reset, term = kernels.compute_im_reset(pos, ref, no_pass, prog, jnp.float32(0.25), use_mean=False)
    assert term.tolist() == [True, True, False]

    # eval mode (mean > 0.5): only env 1 (mean offset 0.3*sqrt(3)=0.52)
    reset, term = kernels.compute_im_reset(pos, ref, no_pass, prog, jnp.float32(0.5), use_mean=True)
    assert term.tolist() == [False, True, False]

    # progress gate suppresses early termination
    reset, term = kernels.compute_im_reset(
        pos, ref, no_pass, jnp.array([0, 1, 1]), jnp.float32(0.25), use_mean=False
    )
    assert term.tolist() == [False, False, False]

    # pass_time forces reset without termination
    reset, term = kernels.compute_im_reset(
        pos, pos, jnp.ones(3, bool), prog, jnp.float32(0.25), use_mean=False
    )
    assert reset.tolist() == [True, True, True]
    assert term.tolist() == [False, False, False]
