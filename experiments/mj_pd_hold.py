"""MuJoCo ground-truth PD-hold: same clip frame 0, same stable-PD gains.

Compares against experiments/pd_hold.py (our engine): if MuJoCo also drifts
~0.2 m in 0.7 s, open-loop standing is genuinely unstable and the eval
failure is an RL problem; if MuJoCo stands, our contact model is at fault.

JAX_PLATFORMS=cpu python experiments/mj_pd_hold.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import mujoco

from phc_tpu.assets import smpl_humanoid as H
from phc_tpu.physics.model import build_smpl_model
from phc_tpu.motionlib import MotionLib, get_motion_state
import jax
import jax.numpy as jnp

model = build_smpl_model()
m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball", timestep=1.0 / 120.0))
d = mujoco.MjData(m)

lib = MotionLib(
    "/root/reference/sample_data/cmu_mocap_05_06.pkl", min_length=10,
    max_length=600, is_deterministic=True, step_dt=1.0 / 30.0, seed=0,
)
data = lib.load_motions(num_motions=1, sample_idxes=np.zeros(1, np.int64),
                        randomize_heading=False, deterministic_crop=True)
ref0 = get_motion_state(data, jnp.zeros(1, jnp.int32), jnp.zeros(1))

root_pos = np.asarray(ref0.root_pos[0])
root_rot = np.asarray(ref0.root_rot[0])           # xyzw
dof_pos = np.asarray(ref0.dof_pos[0])             # (69,) exp-map per joint
root_vel = np.asarray(ref0.root_vel[0])
root_ang_vel = np.asarray(ref0.root_ang_vel[0])
dof_vel = np.asarray(ref0.dof_vel[0])

to_wxyz = lambda q: np.concatenate([q[3:4], q[:3]], -1)
from scipy.spatial.transform import Rotation as sRot

qpos = np.zeros(m.nq)
qpos[:3] = root_pos
qpos[3:7] = to_wxyz(root_rot)
for j in range(23):
    aa = dof_pos[3 * j : 3 * j + 3]
    q = sRot.from_rotvec(aa).as_quat()
    qpos[7 + 4 * j : 11 + 4 * j] = to_wxyz(q)
d.qpos[:] = qpos
qvel = np.zeros(m.nv)
qvel[:3] = root_vel
# MuJoCo free-joint angular velocity is in the BODY frame
qvel[3:6] = sRot.from_quat(root_rot).inv().apply(root_ang_vel)
qvel[6:] = dof_vel
d.qvel[:] = qvel
mujoco.mj_forward(m, d)
print(f"initial root: {d.qpos[:3]}, min foot z contact dist check nconstr={d.ncon}")

kp = model.kp.copy()
kd = model.kd.copy()
hold = dof_pos.copy()
dt = 1.0 / 120.0

print(f"initial |root_vel|={np.linalg.norm(root_vel):.4f} |dof_vel|max={np.abs(dof_vel).max():.3f}")

for t in range(90):  # 90 control steps of 1/60*2 substeps at 1/120
    for _ in range(2):
        # stable-PD on exp-map coords (same formula as engine.pd_actuation)
        q = np.zeros(69)
        for j in range(23):
            qj = d.qpos[7 + 4 * j : 11 + 4 * j]  # wxyz
            q[3 * j : 3 * j + 3] = sRot.from_quat(np.r_[qj[1:4], qj[0]]).as_rotvec()
        qd = d.qvel[6:]
        tau = kp * (hold - q - dt * qd) - kd * qd
        d.qfrc_applied[:] = 0.0
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(m, d)
    if t % 5 == 0 or d.qpos[2] < 0.5:
        drift = np.linalg.norm(d.qpos[:2] - root_pos[:2])
        print(f"t={t:3d} root_h={d.qpos[2]:.3f} root_xy_drift={drift:.3f}")
    if d.qpos[2] < 0.4:
        print("FELL")
        break
