"""Scaling-efficiency benchmark: env-steps/sec vs device count.

The reference is single-GPU (no distributed backend, SURVEY.md §2.9/§5.8);
this harness measures the TPU-native framework's weak scaling — fixed
4096 envs PER device, the production regime — over a (data,) mesh of
1..N devices, with the sharded train step (shard_map + pmean gradient
reduction over ICI).

On real multi-chip hardware this produces the scaling report BASELINE.md
asks for. Without TPUs, run on a virtual CPU mesh to validate the harness
(absolute times are then meaningless):

  python scripts/bench_scaling.py --cpu-devices 8 --envs-per-device 16

Prints one JSON line per mesh size:
  {"devices": n, "env_steps_per_sec": S, "efficiency_vs_1": e}
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force a virtual CPU mesh with N devices (validation mode)")
    ap.add_argument("--envs-per-device", type=int, default=4096)
    ap.add_argument("--steps-per-env", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from phc_tpu.runtime.jax_setup import setup_cache

    setup_cache()

    from phc_tpu.config import EnvConfig, TrainConfig, PolicyConfig
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.motionlib import MotionLib
    from phc_tpu.parallel import make_mesh
    from phc_tpu.parallel.mesh import shard_train_step
    from phc_tpu.rl import ppo as ppo_mod

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    print(f"devices available: {len(devices)} ({devices[0].platform})", file=sys.stderr)

    base_sps = None
    for n in sizes:
        B = args.envs_per_device * n
        env_cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL)
        train_cfg = TrainConfig(
            batch_size=B * args.steps_per_env,
            minibatch_size=B * args.steps_per_env // 4,
        )
        lib = MotionLib(SAMPLE_PKL, is_deterministic=True,
                        step_dt=env_cfg.physics.sim_timestep * env_cfg.physics.control_freq_inv)
        data = lib.load_motions(num_motions=min(B, 256))
        env = henv.make_env(env_cfg)
        ppo = ppo_mod.make_ppo(train_cfg, env, PolicyConfig())

        mesh = make_mesh(data_axis=n, model_axis=1, devices=devices[:n])
        state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(jax.random.PRNGKey(0))
        runner = jax.jit(lambda d, r: ppo_mod.init_runner(ppo, d, r))(data, jax.random.PRNGKey(1))
        state = mesh.replicate(state)
        runner = mesh.shard_batch(runner)
        data_r = mesh.replicate(data)

        step_fn = jax.jit(
            shard_train_step(mesh, lambda data, state, runner, pmean_axis: ppo_mod.train_step(
                ppo, data, state, runner, pmean_axis=pmean_axis))
        )

        state, runner, losses = step_fn(state, runner, data_r)
        float(np.asarray(losses["policy_loss"]))  # sync (axon: block_until_ready is a no-op)
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            state, runner, losses = step_fn(state, runner, data_r)
            float(np.asarray(losses["policy_loss"]))
            times.append(time.time() - t0)
        dt = float(np.median(times))
        sps = train_cfg.batch_size / dt
        if base_sps is None:
            base_sps = sps / n  # per-device at n=1
        eff = sps / (base_sps * n)
        print(json.dumps({
            "devices": n,
            "env_steps_per_sec": round(sps, 1),
            "per_device": round(sps / n, 1),
            "efficiency_vs_1": round(eff, 4),
        }))


if __name__ == "__main__":
    main()
