"""Golden tests: JAX dynamics core vs MuJoCo CPU oracle + behavioral checks.

This is the validation strategy SURVEY.md §4 calls for — the reference
trusts PhysX blindly; here every dynamics quantity (mass properties, FK,
body velocities, mass matrix, bias forces) is checked against MuJoCo on the
same ball-joint humanoid, and stepping is checked behaviorally (standing
under PD, falling under gravity, energy sanity).
"""

import os
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

from phc_tpu.assets import smpl_humanoid as H
from phc_tpu.physics import (
    PhysicsState,
    bias_forces,
    build_pd_action_offset_scale,
    build_smpl_model,
    default_state,
    dof_positions,
    forward_kinematics,
    mass_matrix,
    state_from_parts,
    step,
)


@pytest.fixture(scope="module")
def model():
    return build_smpl_model()


@pytest.fixture(scope="module")
def mj():
    import mujoco

    m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball"))
    return mujoco, m, mujoco.MjData(m)


def random_state(model, B=3, seed=0, z=5.0):
    rng = np.random.default_rng(seed)
    root_pos = rng.normal(size=(B, 3)).astype(np.float32) + np.array([0, 0, z], np.float32)
    quats = sRot.random(B * 24, random_state=1).as_quat().reshape(B, 24, 4).astype(np.float32)
    vel = (0.5 * rng.normal(size=(B, model.num_dofs))).astype(np.float32)
    return PhysicsState(jnp.asarray(root_pos), jnp.asarray(quats), jnp.asarray(vel))


def set_mujoco_state(mujoco, m, d, state, b):
    to_wxyz = lambda q: np.concatenate([q[..., 3:4], q[..., :3]], -1)
    quats = np.asarray(state.joint_quat[b])
    qpos = np.zeros(m.nq)
    qpos[:3] = np.asarray(state.root_pos[b])
    qpos[3:7] = to_wxyz(quats[0])
    for j in range(1, 24):
        qpos[7 + 4 * (j - 1) : 7 + 4 * j] = to_wxyz(quats[j])
    d.qpos[:] = qpos
    d.qvel[:] = np.asarray(state.vel[b])
    mujoco.mj_forward(m, d)


def test_mass_properties_match_mujoco(model, mj):
    mujoco, m, d = mj
    np.testing.assert_allclose(model.mass, m.body_mass[1:], rtol=1e-6)
    np.testing.assert_allclose(model.com, m.body_ipos[1:], atol=1e-7)
    for i in range(24):
        ours = np.sort(np.linalg.eigvalsh(model.inertia[i]))
        theirs = np.sort(m.body_inertia[1 + i])
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_fk_and_velocities_match_mujoco(model, mj):
    mujoco, m, d = mj
    state = random_state(model)
    frame = jax.jit(lambda s: forward_kinematics(model, s))(state)
    for b in range(2):
        set_mujoco_state(mujoco, m, d, state, b)
        np.testing.assert_allclose(np.asarray(frame.pos[b]), d.xpos[1:], atol=1e-5)
        res = np.zeros(6)
        for i in range(24):
            mujoco.mj_objectVelocity(m, d, mujoco.mjtObj.mjOBJ_XBODY, i + 1, res, 0)
            np.testing.assert_allclose(np.asarray(frame.ang_vel[b, i]), res[:3], atol=1e-4)
            np.testing.assert_allclose(np.asarray(frame.lin_vel[b, i]), res[3:], atol=1e-4)


def test_mass_matrix_matches_mujoco(model, mj):
    mujoco, m, d = mj
    state = random_state(model)
    M = np.asarray(jax.jit(lambda s: mass_matrix(model, forward_kinematics(model, s)))(state))
    for b in range(3):
        set_mujoco_state(mujoco, m, d, state, b)
        Mmj = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, Mmj)
        rel = np.abs(M[b] - Mmj).max() / np.abs(Mmj).max()
        assert rel < 1e-4, f"mass matrix rel err {rel}"


def test_bias_forces_match_mujoco(model, mj):
    mujoco, m, d = mj
    state = random_state(model)
    C = np.asarray(
        jax.jit(lambda s: bias_forces(model, forward_kinematics(model, s), s))(state)
    )
    for b in range(3):
        set_mujoco_state(mujoco, m, d, state, b)
        rel = np.abs(C[b] - d.qfrc_bias).max() / np.abs(d.qfrc_bias).max()
        assert rel < 1e-4, f"bias rel err {rel}"


def test_free_fall_acceleration(model):
    """A humanoid dropped from high altitude accelerates at ~-g."""
    state = default_state(model, batch=2, height=100.0)
    pd_target = jnp.zeros((2, 69))
    step_j = jax.jit(lambda s: step(model, s, pd_target))
    z0 = float(state.root_pos[0, 2])
    v_prev = 0.0
    state, _ = step_j(state)
    vz = float(state.vel[0, 2])
    # after one control step (2 substeps of dt)
    expect = -9.81 * model.dt * model.substeps
    # PD torques on joints don't affect the root's free fall much
    np.testing.assert_allclose(vz, expect, rtol=0.1)


def test_standing_under_pd(model):
    """From the default pose on the ground with zero-pose PD targets, the
    humanoid should remain upright for 60 control steps (2 seconds)."""
    state = default_state(model, batch=2, height=0.94)
    pd_target = jnp.zeros((2, 69))
    step_j = jax.jit(lambda s: step(model, s, pd_target)[0])
    for _ in range(60):
        state = step_j(state)
    z = np.asarray(state.root_pos[:, 2])
    assert np.all(z > 0.6), f"fell: root heights {z}"
    assert np.all(z < 1.2), f"launched: root heights {z}"
    assert np.all(np.isfinite(np.asarray(state.vel)))
    # velocities settle to small values
    assert np.abs(np.asarray(state.vel)).max() < 8.0


def test_frozen_substeps_track_full(model):
    """substep_mode="frozen" (system built+factored once per control step,
    TGS-style velocity iterations) must stay close to the full per-substep
    rebuild over a dynamic trajectory: same contact set policy, same
    stable-PD, only M/C/S/contact geometry lag by dt inside a step."""
    import dataclasses

    m_frozen = dataclasses.replace(model, substep_mode="frozen")
    rng = np.random.default_rng(7)
    B = 2
    state = default_state(model, batch=B, height=0.94)
    state = state._replace(
        vel=jnp.asarray((0.3 * rng.normal(size=(B, model.num_dofs))).astype(np.float32))
    )
    pd = jnp.asarray((0.2 * rng.normal(size=(B, 69))).astype(np.float32))
    step_full = jax.jit(lambda s: step(model, s, pd)[0])
    step_froz = jax.jit(lambda s: step(m_frozen, s, pd)[0])
    s1, s2 = state, state
    for _ in range(15):  # 0.5 s with ground contact
        s1 = step_full(s1)
        s2 = step_froz(s2)
    # different integrators — behavioral closeness, not bitwise
    assert np.all(np.isfinite(np.asarray(s2.vel)))
    np.testing.assert_allclose(
        np.asarray(s1.root_pos), np.asarray(s2.root_pos), atol=0.05
    )
    f1 = forward_kinematics(model, s1)
    f2 = forward_kinematics(model, s2)
    body_err = np.abs(np.asarray(f1.pos) - np.asarray(f2.pos)).max()
    assert body_err < 0.10, f"frozen-mode body divergence {body_err}"


def test_frozen_substeps_standing(model):
    """Standing stability (the contact-chatter-sensitive case) in frozen mode."""
    import dataclasses

    m_frozen = dataclasses.replace(model, substep_mode="frozen")
    state = default_state(model, batch=2, height=0.94)
    pd_target = jnp.zeros((2, 69))
    step_j = jax.jit(lambda s: step(m_frozen, s, pd_target)[0])
    for _ in range(60):
        state = step_j(state)
    z = np.asarray(state.root_pos[:, 2])
    assert np.all(z > 0.6), f"fell: root heights {z}"
    assert np.all(z < 1.2), f"launched: root heights {z}"
    assert np.abs(np.asarray(state.vel)).max() < 8.0


def test_state_from_parts_roundtrip(model):
    rng = np.random.default_rng(3)
    B = 4
    root_pos = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    root_rot = jnp.asarray(sRot.random(B, random_state=2).as_quat().astype(np.float32))
    dof_pos = jnp.asarray((0.5 * rng.normal(size=(B, 69))).astype(np.float32))
    root_vel = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    root_ang_vel = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    dof_vel = jnp.asarray(rng.normal(size=(B, 69)).astype(np.float32))

    st = state_from_parts(root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel)
    np.testing.assert_allclose(np.asarray(dof_positions(st)), np.asarray(dof_pos), atol=1e-4)
    frame = forward_kinematics(model, st)
    # world root angular velocity recovered
    np.testing.assert_allclose(np.asarray(frame.ang_vel[:, 0]), np.asarray(root_ang_vel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(frame.lin_vel[:, 0]), np.asarray(root_vel), atol=1e-5)


def test_pd_action_offset_scale(model):
    offset, scale = build_pd_action_offset_scale(model)
    assert offset.shape == (69,) and scale.shape == (69,)
    names = list(model.body_names[1:])
    lk = names.index("L_Knee") * 3 + 1
    rk = names.index("R_Knee") * 3 + 1
    assert scale[lk] == 5.0 and scale[rk] == 5.0  # stronger-knee hack
    # regular 180deg joints: min(1.2*pi, pi) = pi
    assert abs(scale[0] - np.pi) < 1e-5
    np.testing.assert_allclose(offset, 0.0)


_PARITY_SCRIPT = r"""
import dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from phc_tpu.physics.model import build_smpl_model
from phc_tpu.physics.engine import default_state, step

model = build_smpl_model()
m_lanes = dataclasses.replace(model, solver="lanes")
m_schur = dataclasses.replace(model, solver="schur")
state = default_state(model, batch=2, height=0.94)
pd = jnp.zeros((2, 69))
s1, s2 = state, state
for _ in range(5):
    s1, _ = step(m_lanes, s1, pd)
    s2, _ = step(m_schur, s2, pd)
np.testing.assert_allclose(np.asarray(s1.root_pos), np.asarray(s2.root_pos), atol=2e-4)
np.testing.assert_allclose(np.asarray(s1.vel), np.asarray(s2.vel), atol=5e-3)
print("PARITY_OK")
"""


def test_substep_solver_parity():
    """The TPU production solver (Pallas lanes Cholesky, interpret mode on
    CPU) and the Schur-block solver must integrate to matching states — the
    engine picks per-backend, so this pins cross-backend consistency.

    Runs in a SUBPROCESS: interpret-mode Pallas inside the substep loop
    corrupts the XLA CPU process state — a later large jit compile in the
    same process segfaults/aborts (reproduced 2026-08-18 at
    test_ppo.py::test_reward_improves_on_single_clip, both via the
    persistent-cache deserialize path and via fresh backend_compile).
    Subprocess isolation keeps the main pytest process clean.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _PARITY_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, f"parity subprocess failed:\n{proc.stderr[-3000:]}"
    assert "PARITY_OK" in proc.stdout
