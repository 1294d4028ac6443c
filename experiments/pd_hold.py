"""PD-hold diagnostic: reset to the clip's first frame and hold that pose.

Separates two failure modes of the oracle-tracking divergence:
  * joints track their PD targets but the floating base tips over -> balance
    (expected open-loop; RL feedback is supposed to fix it)
  * joints sag/lag their targets -> PD gains / dynamics / torque path wrong

JAX_PLATFORMS=cpu python experiments/pd_hold.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache
setup_cache()

from phc_tpu.config import AppConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib, get_motion_state
from phc_tpu.physics import forward_kinematics
from phc_tpu.physics.engine import dof_positions

cfg = AppConfig()
B = 2
cfg.env.num_envs = B
cfg.env.motion_file = "/root/reference/sample_data/cmu_mocap_05_06.pkl"

lib = MotionLib(
    cfg.env.motion_file, min_length=cfg.env.min_motion_len,
    max_length=600, is_deterministic=True,
    step_dt=cfg.env.physics.sim_timestep * cfg.env.physics.control_freq_inv,
    seed=0,
)
data = lib.load_motions(num_motions=B, sample_idxes=np.zeros(B, np.int64),
                        randomize_heading=False, deterministic_crop=True)
env = henv.make_env(cfg.env, motion_ids=np.arange(B, dtype=np.int64), eval_mode=True)

state, obs = jax.jit(lambda d, r: henv.reset_all(env, d, r))(data, jax.random.PRNGKey(0))

ids = jnp.arange(B, dtype=jnp.int32)
ref0 = get_motion_state(data, ids, jnp.zeros(B))
hold_dof = ref0.dof_pos  # (B, 69) target: the first frame's pose
pd_offset = jnp.asarray(np.asarray(env.pd_offset))
pd_scale = jnp.asarray(np.asarray(env.pd_scale))
a_hold = (hold_dof - pd_offset) / pd_scale

def hold_step(d, s):
    pre_finite = jnp.all(jnp.isfinite(s.physics.vel), axis=-1)
    s, out = henv.step(env, d, s, a_hold)
    frame = forward_kinematics(env.model, s.physics)
    dofp = dof_positions(s.physics)
    joint_err = jnp.abs(dofp - hold_dof).mean(axis=-1)      # (B,) rad
    joint_max = jnp.abs(dofp - hold_dof).max(axis=-1)
    root_h = s.physics.root_pos[:, 2]
    root_xy = jnp.linalg.norm(s.physics.root_pos[:, :2] - ref0.root_pos[:, :2], axis=-1)
    vmax = jnp.abs(s.physics.vel).max(axis=-1)
    return s, joint_err, joint_max, root_h, root_xy, out.terminated, out.truncated, pre_finite, vmax

step_j = jax.jit(hold_step)
print(f"initial root height: {float(np.asarray(ref0.root_pos)[0, 2]):.3f}")
for t in range(90):
    state, je, jm, rh, rxy, term, trunc, fin, vmax = step_j(data, state)
    term0, trunc0, fin0 = bool(np.asarray(term)[0]), bool(np.asarray(trunc)[0]), bool(np.asarray(fin)[0])
    if t % 5 == 0 or term0 or trunc0 or not fin0:
        print(f"t={t:3d} joint_err={float(np.asarray(je)[0]):.4f} joint_max={float(np.asarray(jm)[0]):.4f} "
              f"root_h={float(np.asarray(rh)[0]):.3f} root_xy_drift={float(np.asarray(rxy)[0]):.3f} "
              f"vmax={float(np.asarray(vmax)[0]):.2f} term={term0} trunc={trunc0} finite={fin0}")
    if float(np.asarray(rh)[0]) < 0.4:
        print("FELL")
        break
