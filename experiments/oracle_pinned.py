"""Pinned-root oracle: is JOINT tracking through the kick feasible at the
production PD gains, once balance is removed from the problem?

Replays the clip with PD targets = next-frame reference dofs while the
root pose/velocity is overridden to the reference every control step
(hand-of-god). If per-body deviation stays small through the kick window
(t ~ 1.0-1.5 s), the plant can express the motion and the eval failure is
a balance/anticipation problem (an RL lever); if joints still lag, the
actuation itself (gains/armature/contact) limits tracking (a physics
lever, e.g. kp_scale).

CPU-only (jax.config platform switch; env vars cannot override the
sandbox's axon pin).
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_backend_optimization_level" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_backend_optimization_level=0"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache
setup_cache()

from phc_tpu.config import AppConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib, get_motion_state
from phc_tpu.physics import forward_kinematics

kp_scale = float(sys.argv[sys.argv.index("--kp") + 1]) if "--kp" in sys.argv else 1.0

cfg = AppConfig()
B = 1
cfg.env.num_envs = B
cfg.env.kp_scale = kp_scale
cfg.env.motion_file = "/root/reference/sample_data/cmu_mocap_05_06.pkl"

lib = MotionLib(cfg.env.motion_file, max_length=600, is_deterministic=True,
                step_dt=cfg.env.physics.sim_timestep * cfg.env.physics.control_freq_inv, seed=0)
data = lib.load_motions(num_motions=B, sample_idxes=np.zeros(B, np.int64),
                        randomize_heading=False, deterministic_crop=True)
env = henv.make_env(cfg.env, eval_mode=True)
state, obs = jax.jit(lambda d, r: henv.reset_all(env, d, r))(data, jax.random.PRNGKey(0))

pd_offset = jnp.asarray(env.pd_offset)
pd_scale = jnp.asarray(env.pd_scale)
ids = jnp.arange(B, dtype=jnp.int32)

def pinned_step(d, s, t):
    tgt_time = jnp.minimum((t + 1.0) * env.control_dt, d.motion_lengths[:B])
    ref_next = get_motion_state(d, ids, tgt_time)
    a = (ref_next.dof_pos - pd_offset) / pd_scale
    s, out = henv.step(env, d, s, a)
    # hand of god: override the root with the reference state
    ph = s.physics
    ph = ph._replace(
        root_pos=ref_next.root_pos,
        joint_quat=ph.joint_quat.at[:, 0].set(ref_next.root_rot),
        vel=ph.vel.at[:, 0:3].set(ref_next.root_vel).at[:, 3:6].set(
            # stored body-frame (MuJoCo freejoint): rotate world ang vel back
            henv.T.quat_rotate(henv.T.quat_conjugate(ref_next.root_rot), ref_next.root_ang_vel)
        ),
    )
    s = s._replace(physics=ph)
    frame = forward_kinematics(env.model, s.physics)
    ref = get_motion_state(d, ids, tgt_time)
    dev = jnp.linalg.norm(frame.pos - ref.rg_pos, axis=-1)
    return s, dev

step_j = jax.jit(pinned_step)
n_steps = int(np.asarray(data.motion_lengths)[0] / env.control_dt) - 1
print(f"kp_scale={kp_scale} steps={n_steps}")
devs = []
for t in range(n_steps):
    state, dev = step_j(data, state, jnp.float32(t))
    devs.append(np.asarray(dev)[0])
    if 28 <= t <= 50 or t % 20 == 0:
        print(f"t={t:3d} mean_dev={devs[-1].mean():.4f} max_dev={devs[-1].max():.4f} worst={int(devs[-1].argmax())}")
devs = np.stack(devs)
print(f"overall mean {devs.mean():.4f} | kick window (t 30..48) mean {devs[30:48].mean():.4f} max {devs[30:48].max():.4f}")
