"""Headline benchmark: env-steps/sec/chip of the full PPO pipeline.

Measures the complete train_step (policy forward + physics + obs/reward +
GAE + 16 minibatch updates) at 4096 envs on one chip — the same quantity
the reference's dashboard SPS tracks (`clean_pufferl/structs.py:354`, the
throughput of `evaluate`+`train` per agent step).

Prints ONE json line:
  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / 100000}

vs_baseline uses 100k steps/s as the Isaac Gym A100 reference throughput
for PHC at 4096 envs (the reference publishes no number — BASELINE.md; Isaac
Gym humanoid benchmarks are ~100-200k SPS and PHC's heavy obs/reward path
sits at the low end). The build target is vs_baseline >= 5.
"""

import os
import sys
import time
import json
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
BASELINE_SPS = 100_000.0


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    import jax

    from phc_tpu.config import EnvConfig, TrainConfig, PolicyConfig
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.motionlib import MotionLib
    from phc_tpu.rl import ppo as ppo_mod

    env_cfg = EnvConfig(num_envs=num_envs, motion_file=SAMPLE_PKL)
    train_cfg = TrainConfig(
        batch_size=num_envs * 32, minibatch_size=num_envs * 32 // 4
    )
    pol_cfg = PolicyConfig()

    lib = MotionLib(
        SAMPLE_PKL,
        is_deterministic=True,
        step_dt=env_cfg.physics.sim_timestep * env_cfg.physics.control_freq_inv,
    )
    data = lib.load_motions(num_motions=min(num_envs, 256))
    env = henv.make_env(env_cfg, motion_ids=np.zeros(num_envs, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)

    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = jax.jit(lambda d, r: ppo_mod.init_runner(ppo, d, r))(data, jax.random.PRNGKey(1))

    train_step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))

    # warmup/compile (block on the full state, not just losses — async
    # dispatch makes partial blocking under-measure)
    state, runner, losses = train_step(data, state, runner)
    jax.block_until_ready((state, runner, losses))

    t0 = time.time()
    for _ in range(iters):
        state, runner, losses = train_step(data, state, runner)
    jax.block_until_ready((state, runner, losses))
    dt = time.time() - t0

    steps = iters * train_cfg.batch_size
    sps = steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / BASELINE_SPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
