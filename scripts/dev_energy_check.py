"""Kinetic-energy consistency: 0.5 v^T M v vs sum of body KEs, ours vs MuJoCo."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import mujoco
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

from phc_tpu.assets import smpl_humanoid as H
from phc_tpu.physics import build_smpl_model, PhysicsState, forward_kinematics, mass_matrix
from phc_tpu import transforms as T

model = build_smpl_model()
m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball"))
d = mujoco.MjData(m)

rng = np.random.default_rng(0)
root_pos = rng.normal(size=(1, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32)
quats = sRot.random(24, random_state=1).as_quat().reshape(1, 24, 4).astype(np.float32)
vel = (0.5 * rng.normal(size=(1, model.num_dofs))).astype(np.float32)

state = PhysicsState(root_pos=jnp.asarray(root_pos), joint_quat=jnp.asarray(quats), vel=jnp.asarray(vel))
frame = jax.jit(lambda s: forward_kinematics(model, s))(state)
M_ours = np.asarray(jax.jit(lambda s: mass_matrix(model, forward_kinematics(model, s)))(state))[0]

# direct KE from body velocities (world frame)
rot = np.asarray(frame.rot[0])
pos = np.asarray(frame.pos[0])
w = np.asarray(frame.ang_vel[0])
v_origin = np.asarray(frame.lin_vel[0])
com_w = pos + sRot.from_quat(rot).apply(model.com)
v_com = v_origin + np.cross(w, com_w - pos)
ke = 0.0
for i in range(24):
    R = sRot.from_quat(rot[i]).as_matrix()
    Iw = R @ model.inertia[i] @ R.T
    ke += 0.5 * model.mass[i] * v_com[i] @ v_com[i] + 0.5 * w[i] @ Iw @ w[i]

arm = np.concatenate([np.zeros(6), model.armature])
ke_arm = 0.5 * np.sum(arm * vel[0] ** 2)

ke_M_ours = 0.5 * vel[0] @ M_ours @ vel[0]

to_wxyz = lambda q: np.concatenate([q[..., 3:4], q[..., :3]], -1)
qpos = np.zeros(m.nq)
qpos[:3] = root_pos[0]
qpos[3:7] = to_wxyz(quats[0, 0])
for j in range(1, 24):
    qpos[7 + 4 * (j - 1) : 7 + 4 * j] = to_wxyz(quats[0, j])
d.qpos[:] = qpos
d.qvel[:] = vel[0]
mujoco.mj_forward(m, d)
Mmj = np.zeros((m.nv, m.nv))
mujoco.mj_fullM(m, d, Mmj)
ke_M_mj = 0.5 * vel[0] @ Mmj @ vel[0]

print(f"KE direct (bodies):    {ke:.6f}")
print(f"KE direct + armature:  {ke + ke_arm:.6f}")
print(f"KE from our M:         {ke_M_ours:.6f}")
print(f"KE from mujoco M:      {ke_M_mj:.6f}")

err = np.abs(M_ours - Mmj)
print("\nworst blocks (dof ranges): max err", err.max(), "at", np.unravel_index(err.argmax(), err.shape))
# error by dof group
names = ["root_lin", "root_ang"] + [f"{n}" for n in model.body_names[1:]]
groups = [range(0, 3), range(3, 6)] + [range(6 + 3 * i, 9 + 3 * i) for i in range(23)]
worst = []
for a, ga in zip(names, groups):
    for b, gb in zip(names, groups):
        e = err[np.ix_(list(ga), list(gb))].max()
        if e > 0.5:
            worst.append((e, a, b))
for e, a, b in sorted(worst, reverse=True)[:12]:
    print(f"  {a:12s} x {b:12s}: {e:.3f}")
