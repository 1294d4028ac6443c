"""Oracle-action tracking diagnostic.

Can the physics engine track the sample clip when the policy is replaced by
an oracle that sets PD targets to the reference's next-frame dof pose?
If yes -> the eval failure at ~step 45 is an RL/training problem.
If no  -> the engine itself cannot follow the stand-to-walk acceleration
(foot slip, PD gains, torque limits) and training can never succeed.

Runs on CPU (keeps the TPU free): JAX_PLATFORMS=cpu python experiments/oracle_track.py
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

# this sandbox pins JAX_PLATFORMS=axon in a way env vars cannot override;
# jax.config is the only reliable CPU switch (keeps the TPU free)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache
setup_cache()

from phc_tpu.config import AppConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib, get_motion_state
from phc_tpu.physics import forward_kinematics

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

pd_offset = np.asarray(env.pd_offset)
pd_scale = np.asarray(env.pd_scale)
ids = jnp.arange(B, dtype=jnp.int32)

def oracle_step(d, s, t):
    # PD target = reference dof pose a lookahead ahead of the CURRENT frame
    tgt_time = jnp.minimum((t + 1.0) * env.control_dt, d.motion_lengths[:B])
    ref_next = get_motion_state(d, ids, tgt_time)
    a = (ref_next.dof_pos - jnp.asarray(pd_offset)) / jnp.asarray(pd_scale)
    s, out = henv.step(env, d, s, a)
    frame = forward_kinematics(env.model, s.physics)
    cur_time = jnp.minimum((t + 1.0) * env.control_dt, d.motion_lengths[:B])
    ref = get_motion_state(d, ids, cur_time)
    dev = jnp.linalg.norm(frame.pos - ref.rg_pos, axis=-1)  # (B, J)
    return s, dev, out.terminated, a

step_j = jax.jit(oracle_step)

n_steps = int(np.asarray(data.motion_lengths)[0] / env.control_dt) - 1
print(f"motion length: {float(np.asarray(data.motion_lengths)[0]):.2f}s, {n_steps} steps")
devs = []
for t in range(n_steps):
    state, dev, term, a = step_j(data, state, jnp.float32(t))
    dev = np.asarray(dev)
    devs.append(dev)
    if t % 15 == 0 or dev[0].mean() > 0.3:
        amax = float(np.abs(np.asarray(a)).max())
        print(f"t={t:3d} mean_dev={dev[0].mean():.4f} max_dev={dev[0].max():.4f} "
              f"worst_body={int(dev[0].argmax())} |a|max={amax:.2f} term={bool(np.asarray(term)[0])}")
    if dev[0].mean() > 0.5:
        print("DIVERGED")
        break
devs = np.stack(devs)
print(f"\nfinal: mean_dev over clip = {devs[:,0].mean():.4f} m, max = {devs[:,0].max():.4f} m")
print(f"per-step mean dev p50/p90/p99: {np.percentile(devs[:,0].mean(-1), [50,90,99])}")
