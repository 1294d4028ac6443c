"""Dev harness: validate the JAX dynamics core against MuJoCo (CPU oracle).

Run: JAX_PLATFORMS=cpu python scripts/dev_physics_check.py
"""

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

from phc_tpu.assets import smpl_humanoid as H
from phc_tpu.physics import (
    build_smpl_model,
    PhysicsState,
    forward_kinematics,
    mass_matrix,
    bias_forces,
)

model = build_smpl_model()
m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball"))
d = mujoco.MjData(m)

rng = np.random.default_rng(0)

# --- mass properties --------------------------------------------------------
print("== mass properties ==")
mj_mass = m.body_mass[1:]
print("mass max rel err:", np.max(np.abs(model.mass - mj_mass) / mj_mass))
mj_ipos = m.body_ipos[1:]
print("com max abs err:", np.max(np.abs(model.com - mj_ipos)))
# principal moments
for i in [0, 1, 3, 13]:
    evals = np.sort(np.linalg.eigvalsh(model.inertia[i]))
    print(f"  body {i} inertia ours {evals} mj {np.sort(m.body_inertia[1 + i])}")

# --- random state ------------------------------------------------------------
B = 3
root_pos = rng.normal(size=(B, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32)
from scipy.spatial.transform import Rotation as sRot

quats = sRot.random(B * 24, random_state=1).as_quat().reshape(B, 24, 4).astype(np.float32)
vel = (0.5 * rng.normal(size=(B, model.num_dofs))).astype(np.float32)

state = PhysicsState(root_pos=jnp.asarray(root_pos), joint_quat=jnp.asarray(quats), vel=jnp.asarray(vel))
frame = jax.jit(lambda s: forward_kinematics(model, s))(state)
M_ours = np.asarray(jax.jit(lambda s: mass_matrix(model, forward_kinematics(model, s)))(state))
C_ours = np.asarray(jax.jit(lambda s: bias_forces(model, forward_kinematics(model, s), s))(state))

to_wxyz = lambda q: np.concatenate([q[..., 3:4], q[..., :3]], -1)

for b in range(B):
    qpos = np.zeros(m.nq)
    qpos[:3] = root_pos[b]
    qpos[3:7] = to_wxyz(quats[b, 0])
    for j in range(1, 24):
        qpos[7 + 4 * (j - 1) : 7 + 4 * j] = to_wxyz(quats[b, j])
    d.qpos[:] = qpos
    d.qvel[:] = vel[b]
    mujoco.mj_forward(m, d)

    if b == 0:
        print("== FK ==")
        grot = np.asarray(frame.rot[b])
        gpos = np.asarray(frame.pos[b])
        xquat = np.concatenate([d.xquat[1:, 1:], d.xquat[1:, :1]], -1)
        print("pos err:", np.max(np.abs(gpos - d.xpos[1:])))
        print("rot err:", np.max(1 - np.abs(np.sum(grot * xquat, -1))))

        print("== body velocities ==")
        res = np.zeros(6)
        verr, werr = 0, 0
        for i in range(24):
            mujoco.mj_objectVelocity(m, d, mujoco.mjtObj.mjOBJ_XBODY, i + 1, res, 0)
            werr = max(werr, np.max(np.abs(res[:3] - np.asarray(frame.ang_vel[b, i]))))
            verr = max(verr, np.max(np.abs(res[3:] - np.asarray(frame.lin_vel[b, i]))))
        print("ang vel err:", werr, "lin vel err:", verr)

    Mmj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mmj)
    merr = np.max(np.abs(M_ours[b] - Mmj))
    mrel = merr / np.max(np.abs(Mmj))
    cerr = np.max(np.abs(C_ours[b] - d.qfrc_bias))
    crel = cerr / max(np.max(np.abs(d.qfrc_bias)), 1e-9)
    print(f"env {b}: |M - Mmj|max {merr:.2e} (rel {mrel:.2e}); |C - qfrc_bias|max {cerr:.2e} (rel {crel:.2e})")
