"""Reproduce + localize the training NaN seen at ~epoch 100 on TPU.

Runs train_step in a loop; every epoch fetches cheap scalar probes:
nan counts in params / obs / physics vel, max |vel|, max |obs|, reward
stats. First probe to fire identifies the stage that blows up.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache

setup_cache()

import os

from phc_tpu.config import EnvConfig, TrainConfig, PolicyConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib
from phc_tpu.rl import ppo as ppo_mod

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"

num_envs = 4096
env_cfg = EnvConfig(num_envs=num_envs, motion_file=SAMPLE_PKL)
train_cfg = TrainConfig()
pol_cfg = PolicyConfig(trunk_dtype="f32" if os.environ.get("NAN_HUNT_FP32") else "bf16")

lib = MotionLib(SAMPLE_PKL, is_deterministic=False, step_dt=env_cfg.physics.sim_timestep * env_cfg.physics.control_freq_inv, seed=1)
data = lib.load_motions(num_motions=num_envs)
env = henv.make_env(env_cfg)
ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)

state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(jax.random.PRNGKey(0))
runner = jax.jit(lambda d, r: ppo_mod.init_runner(ppo, d, r))(data, jax.random.PRNGKey(1))

step_j = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))


@jax.jit
def probes(s, r):
    pnan = sum(jnp.isnan(x).sum() for x in jax.tree_util.tree_leaves(s.params))
    obs = r.obs
    vel = r.env_state.physics.vel
    return jnp.stack(
        [
            pnan.astype(jnp.float32),
            jnp.isnan(obs).sum().astype(jnp.float32),
            jnp.isnan(vel).sum().astype(jnp.float32),
            jnp.abs(vel).max(),
            jnp.abs(obs).max(),
            jnp.abs(r.env_state.physics.root_pos).max(),
        ]
    )


t0 = time.time()
for epoch in range(1, 151):
    state, runner, losses = step_j(data, state, runner)
    if epoch % 5 == 0 or epoch == 1:
        p = np.asarray(probes(state, runner))
        kl = float(losses["approx_kl"])
        cf = float(losses["clipfrac"])
        print(
            f"ep {epoch:4d} t={time.time()-t0:6.1f}s kl={kl:9.4f} cf={cf:6.3f} "
            f"pnan={p[0]:.0f} obsnan={p[1]:.0f} velnan={p[2]:.0f} "
            f"|vel|max={p[3]:9.2f} |obs|max={p[4]:9.2f} |root|max={p[5]:9.2f}",
            flush=True,
        )
        if p[0] > 0 or p[1] > 0 or p[2] > 0 or not np.isfinite(kl):
            print("NaN detected — stopping", flush=True)
            break
print("done", flush=True)
