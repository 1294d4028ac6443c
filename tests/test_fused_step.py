"""Parity: the fused whole-substep Pallas kernel vs the legacy frozen loop.

The fused kernel (phc_tpu/physics/fused_step.py) must integrate to the
same states, torques, and contact forces as the step-by-step XLA loop in
`engine._step_frozen` — same math, one kernel. Runs in a subprocess for
the same reason as test_physics.test_substep_solver_parity: interpret-mode
Pallas inside the substep corrupts later large XLA CPU compiles in the
same process.
"""

import os
import subprocess
import sys
from pathlib import Path

_SCRIPT = r"""
import dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot
from phc_tpu.physics.model import build_smpl_model
from phc_tpu.physics.engine import PhysicsState, default_state, step

base = build_smpl_model(substep_mode="frozen")
m_fused = dataclasses.replace(base, solver="lanes")   # -> fused kernel (interpret)
m_loop = dataclasses.replace(base, solver="schur")    # -> legacy XLA loop

B = 3
state = default_state(base, batch=B, height=0.94)
# perturb: small random joint rotations + velocities so PD, contacts and
# the exp-map integration all see non-trivial inputs
rng = np.random.default_rng(0)
dq = sRot.from_rotvec(0.1 * rng.normal(size=(B * 24, 3))).as_quat().reshape(B, 24, 4)
q0 = np.asarray(state.joint_quat)
def qmul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], -1)
q = qmul(q0, dq.astype(np.float32))
state = PhysicsState(
    root_pos=state.root_pos,
    joint_quat=jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True)),
    vel=jnp.asarray(0.3 * rng.normal(size=(B, base.num_dofs)).astype(np.float32)),
)
pd = jnp.asarray(0.2 * rng.normal(size=(B, 69)).astype(np.float32))

s1, s2 = state, state
for i in range(5):
    s1, info1 = step(m_fused, s1, pd)
    s2, info2 = step(m_loop, s2, pd)
    np.testing.assert_allclose(
        np.asarray(s1.root_pos), np.asarray(s2.root_pos), atol=2e-4,
        err_msg=f"root_pos step {i}")
    np.testing.assert_allclose(
        np.asarray(s1.joint_quat), np.asarray(s2.joint_quat), atol=2e-4,
        err_msg=f"joint_quat step {i}")
    np.testing.assert_allclose(
        np.asarray(s1.vel), np.asarray(s2.vel), atol=5e-3,
        err_msg=f"vel step {i}")
    np.testing.assert_allclose(
        np.asarray(info1["dof_torque"]), np.asarray(info2["dof_torque"]),
        atol=2e-2, rtol=1e-4, err_msg=f"dof_torque step {i}")
    np.testing.assert_allclose(
        np.asarray(info1["contact_forces"]), np.asarray(info2["contact_forces"]),
        atol=2e-2, rtol=1e-4, err_msg=f"contact_forces step {i}")
print("FUSED_PARITY_OK")
"""


def test_fused_substep_parity():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, f"fused parity subprocess failed:\n{proc.stderr[-3000:]}"
    assert "FUSED_PARITY_OK" in proc.stdout


_NARROW_SCRIPT = r"""
import dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot
from phc_tpu.physics.model import build_smpl_model
from phc_tpu.physics import engine as eng

base = build_smpl_model()
m_lanes = dataclasses.replace(base, solver="lanes")   # -> narrow kernel (interpret)
m_xla = dataclasses.replace(base, solver="schur")     # -> XLA oracle

B = 4
st = eng.default_state(base, batch=B, height=0.92)
rng = np.random.default_rng(7)
dq = sRot.from_rotvec(0.25 * rng.normal(size=(B * 24, 3))).as_quat().reshape(B, 24, 4).astype(np.float32)
q0 = np.asarray(st.joint_quat)
def qmul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], -1)
q = qmul(q0, dq)
st = eng.PhysicsState(
    root_pos=st.root_pos,
    joint_quat=jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True)),
    vel=jnp.asarray(0.5 * rng.normal(size=(B, base.num_dofs)).astype(np.float32)),
)
frame = eng.forward_kinematics(base, st)
Sc = eng._motion_subspace_comps(base, frame)

cs_k = eng._contact_system(m_lanes, frame, Sc)
cs_x = eng._contact_system(m_xla, frame, Sc)
for name in ("pen", "active", "v_t1", "v_t2", "v_n", "Jm", "oh_signed", "mA", "mB"):
    a, b = getattr(cs_k, name), getattr(cs_x, name)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
                               err_msg=name)
for name in ("t1", "t2", "n", "x_a", "x_b"):
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(getattr(cs_k, name)[i]), np.asarray(getattr(cs_x, name)[i]),
            atol=2e-5, rtol=1e-4, err_msg=f"{name}[{i}]")
print("NARROW_PARITY_OK")
"""


def test_narrow_phase_lanes_parity():
    """The lanes narrow-phase kernel produces the same compacted contact
    system as the XLA oracle path (same math, one kernel)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _NARROW_SCRIPT],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, f"narrow parity subprocess failed:\n{proc.stderr[-3000:]}"
    assert "NARROW_PARITY_OK" in proc.stdout
