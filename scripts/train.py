"""Train / eval / play entry point.

TPU-native port of the reference CLI (`/root/reference/scripts/train.py`):
modes train|eval|play, the outer epoch loop with motion resampling every
`motion_resample_interval` epochs and evaluation every `eval_interval`
(reference :291-381), checkpointing, and the PMCP curriculum hook.

Usage:
  python scripts/train.py --mode train --env.motion-file <pkl> \
      --env.num-envs 4096 --train.total-timesteps 500000000
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time
import json

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache

setup_cache()

from phc_tpu.config import AppConfig, parse_cli, config_to_dict
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib
from phc_tpu.parallel import make_mesh, shard_train_step
from phc_tpu.rl import ppo as ppo_mod
from phc_tpu.rl import policies, running_norm
from phc_tpu.runtime import checkpoint as ckpt_mod
from phc_tpu.runtime.dashboard import PhaseProfiler, print_dashboard, abbreviate
from phc_tpu.runtime.eval_harness import evaluate_policy, write_by_motion_tsv
from phc_tpu.runtime.metrics import MetricsLogger, StatsAggregator, UtilizationMonitor


def build(cfg: AppConfig):
    lib = MotionLib(
        cfg.env.motion_file,
        min_length=cfg.env.min_motion_len,
        max_length=cfg.env.max_episode_length,
        is_deterministic=False,
        step_dt=cfg.env.physics.sim_timestep * cfg.env.physics.control_freq_inv,
        frame_capacity=cfg.env.motion_frame_capacity,
        seed=cfg.train.seed,
    )
    B = cfg.env.num_envs
    # initial even sampling over the corpus (reference humanoid_phc.py:642-646)
    sample_idxes = lib.even_sample_indices(B)
    data = lib.load_motions(num_motions=B, sample_idxes=sample_idxes)
    if lib.frame_capacity is None:
        # fix the packed-buffer capacity at 1.25x the first load so future
        # resamples never retrace
        lib.frame_capacity = int(data.gts.shape[0] * 1.25) + 1
        data = lib.load_motions(num_motions=B, sample_idxes=sample_idxes)

    env = henv.make_env(cfg.env, motion_ids=np.arange(B, dtype=np.int64))
    ppo = ppo_mod.make_ppo(cfg.train, env, cfg.policy)
    return lib, data, env, ppo


def mode_train(cfg: AppConfig):
    lib, data, env, ppo = build(cfg)
    mesh = make_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis)
    use_dp = mesh.data_size > 1
    print(f"devices: {jax.devices()}; mesh: data={mesh.data_size} model={mesh.model_size}")

    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, r_init, r_env = jax.random.split(rng, 3)
    # one jitted program: eager init chains are pathologically slow on the
    # tunneled backend (every small op round-trips)
    state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(r_init)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"Model size: {abbreviate(n_params)} parameters")

    runner = jax.jit(lambda d, r: ppo_mod.init_runner(ppo, d, r))(data, r_env)

    if use_dp:
        # data-parallel training: learner state + motion data replicated,
        # env batch (runner) sharded over the data axis; gradients/statistics
        # pmean inside the step (ppo.update pmean_axis). Rollout randomness
        # is per-env, so this reproduces the single-device run
        # (tests/test_parallel.py::test_dp_equivalence).
        assert cfg.env.num_envs % mesh.data_size == 0, (
            f"num_envs {cfg.env.num_envs} must divide over data axis {mesh.data_size}"
        )
        # per-shard env count must split into the same number of (strided)
        # minibatch groups for DP == single-device minibatch equivalence
        assert (cfg.env.num_envs // mesh.data_size) % ppo.num_minibatches == 0, (
            f"per-shard envs {cfg.env.num_envs // mesh.data_size} must divide "
            f"into {ppo.num_minibatches} minibatches"
        )
        sharded_step = shard_train_step(
            mesh,
            lambda state, runner, data, pmean_axis: ppo_mod.train_step(
                ppo, data, state, runner, pmean_axis=pmean_axis
            ),
        )
        train_step = jax.jit(lambda d, s, r: sharded_step(s, r, d))
    else:
        train_step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))

    # restore: auto-resume from this experiment's latest checkpoint wins
    # over an explicit seed path (so a run seeded from another experiment's
    # checkpoint does not re-load the stale seed after its own restarts);
    # reference `try_load_checkpoint`, clean_pufferl/utils.py:45-56 —
    # optimizer state and counters included, since the whole PPOState
    # pytree is the checkpoint unit
    # committed policy snapshot (survives the round-boundary checkpoint
    # wipe — scripts/ckpt_snapshot.py); a real checkpoint still wins below
    if cfg.snapshot_path:
        from scripts.ckpt_snapshot import restore_into

        state = restore_into(cfg.snapshot_path, jax.device_get(state))
        state = jax.device_put(state)
        print(f"restored policy snapshot {cfg.snapshot_path}")
    resume_path = (
        ckpt_mod.latest_checkpoint(cfg.train.data_dir, cfg.exp_name) or cfg.checkpoint_path
    )
    if resume_path:
        state = ckpt_mod.load_checkpoint(resume_path, state)
        print(f"restored checkpoint {resume_path}")
        # curriculum sidecar: PMCP termination history + per-(env, phase)
        # failure EMA survive process restarts (without this, a kill/resume
        # silently reset both curricula — SURVEY §5.3's recovery story now
        # covers the sampling state too, not just the learner pytree)
        cur_p = Path(resume_path + ".curriculum.npz")
        if cur_p.exists():
            cur = np.load(cur_p, allow_pickle=False)
            if lib.set_termination_history(cur["termination_history"]):
                print(f"restored PMCP history ({cur_p.name})")
            pf = cur["phase_fail"] if "phase_fail" in cur.files else None
            if (
                cfg.env.phase_curriculum
                and pf is not None
                and pf.shape == tuple(runner.env_state.phase_fail.shape)
            ):
                runner = runner._replace(
                    env_state=runner.env_state._replace(phase_fail=jnp.asarray(pf))
                )
                print("restored phase-curriculum failure EMA")

    if use_dp:
        state = mesh.replicate(state)
        data = mesh.replicate(data)
        runner = mesh.shard_batch(runner)

    profile = PhaseProfiler()
    stats_agg = StatsAggregator()
    utilization = UtilizationMonitor()
    run_dir = Path(cfg.train.data_dir) / cfg.exp_name
    metrics_log = MetricsLogger(run_dir / "metrics.jsonl")
    epoch = int(np.asarray(state.epoch))
    global_step = float(np.asarray(state.global_step))

    # one-epoch-deep pipeline of the per-epoch metrics fetch: (epoch,
    # device global_step, device losses) dispatched last iteration,
    # drained while the next epoch runs on device
    pending = None
    sps_window = []  # (wall_time, global_step) ring for instantaneous SPS

    def drain_pending(p):
        p_epoch, g_dev, losses_dev = p
        global_host, losses_host = jax.device_get((g_dev, losses_dev))
        new_global = float(global_host)
        profile.total_steps += new_global - drain_pending.last_global
        drain_pending.last_global = new_global

        now = time.time()
        sps_window.append((now, new_global))
        if len(sps_window) > 64:
            sps_window.pop(0)
        sps_inst = (
            (sps_window[-1][1] - sps_window[0][1])
            / max(sps_window[-1][0] - sps_window[0][0], 1e-9)
            if len(sps_window) > 1
            else profile.sps()
        )

        loss_host = {k: float(v) for k, v in losses_host.items() if np.ndim(v) == 0}
        # per-component imitation reward means (reference rew_body_pos/rot/
        # lin_vel/ang_vel/power, clean_pufferl/env.py:148-157)
        rr = np.asarray(losses_host.get("reward_raw", np.zeros(5)))
        for i, name in enumerate(("rew_body_pos", "rew_body_rot", "rew_lin_vel", "rew_ang_vel", "rew_power")[: rr.shape[0]]):
            loss_host[name] = float(rr[i])
        extra = {}
        if "phase_fail_hist" in losses_host:
            # jsonl-only (the dashboard formats scalars)
            extra["phase_fail_hist"] = np.asarray(losses_host["phase_fail_hist"]).round(4).tolist()
        metrics_log.log(
            {
                "epoch": p_epoch,
                "global_step": new_global,
                "sps": sps_inst,
                "sps_avg": profile.sps(),
                **loss_host,
                **extra,
                **utilization.snapshot(),
            }
        )
        if p_epoch % cfg.env.log_interval == 0 or p_epoch == 1:
            print_dashboard(
                cfg.env.name, new_global, p_epoch, profile, loss_host, stats_agg.means(),
                msg=f"sps_now={abbreviate(sps_inst)}",
                use_rich=sys.stdout.isatty(),
            )
        return new_global

    drain_pending.last_global = global_step

    # The metrics pipeline is one epoch deep, so `global_step` lags the
    # device by one epoch and the loop can overshoot total_timesteps by up
    # to one epoch of steps (~131k of 500M+). Accepted: a host-side
    # optimistic estimate would stop the dispatch pipeline early and cost
    # more in lost overlap than the overshoot is worth (r4 advisor note).
    while global_step < cfg.train.total_timesteps:
        # --- motion resampling (reference train.py:326-333; seq_motions
        # walks the corpus in order instead of PMCP-weighted sampling,
        # humanoid_phc.py:1370) ----------------------------------------------
        if epoch > 0 and epoch % cfg.train.motion_resample_interval == 0:
            with profile.phase("resample"):
                # carry the phase-fail curriculum across the resample: the EMA
                # is per-(env, phase-bin) and each env's identity is its
                # GLOBAL motion id, so history survives wherever the env's
                # assigned clip is unchanged (single-clip corpora keep all of
                # it; re-rolled assignments start fresh).
                old_ids = np.asarray(lib.curr_motion_ids)
                old_pf = (
                    np.asarray(jax.device_get(runner.env_state.phase_fail))
                    if cfg.env.phase_curriculum
                    else None
                )
                data = lib.load_motions(
                    num_motions=cfg.env.num_envs,
                    random_sample=not cfg.env.seq_motions,
                    start_idx=epoch if cfg.env.seq_motions else 0,
                )
                rng, r_env = jax.random.split(rng)
                runner = jax.jit(lambda d, r: ppo_mod.init_runner(ppo, d, r))(data, r_env)
                if old_pf is not None:
                    new_ids = np.asarray(lib.curr_motion_ids)
                    B = cfg.env.num_envs
                    # env -> loaded-slot assignment (reset_all default)
                    keep = (
                        new_ids[np.arange(B) % len(new_ids)]
                        == old_ids[np.arange(B) % len(old_ids)]
                    )
                    pf = np.where(keep[:, None], old_pf, 0.0).astype(np.float32)
                    runner = runner._replace(
                        env_state=runner.env_state._replace(phase_fail=jnp.asarray(pf))
                    )
                if use_dp:
                    data = mesh.replicate(data)
                    runner = mesh.shard_batch(runner)

        # --- eval + PMCP (reference train.py:314-324) ------------------------
        if cfg.train.eval_interval > 0 and epoch > 0 and epoch % cfg.train.eval_interval == 0:
            with profile.phase("eval"):
                results = run_eval(cfg, lib, ppo, state, epoch=epoch)
                stats_agg.add_dict(results)
                metrics_log.log({"epoch": epoch, "global_step": global_step, **results})
                print(json.dumps(results))

        with profile.phase("train", sync_tree=None):
            # async dispatch: jit returns futures immediately; the fetch of
            # THIS epoch's losses happens one iteration later (below), so the
            # tunnel round-trip for ~20 scalars overlaps the next epoch's
            # device execution instead of stalling it (live-vs-bench SPS gap,
            # r3 VERDICT #3). Queue depth stays <=1: every iteration drains
            # the previous dispatch before adding a new one.
            state, runner, losses = train_step(data, state, runner)

        epoch += 1
        if pending is not None:
            global_step = drain_pending(pending)
        pending = (epoch, state.global_step, losses)

        if epoch % cfg.train.checkpoint_interval == 0:
            path = ckpt_mod.save_checkpoint(
                cfg.train.data_dir, cfg.exp_name, epoch, state, config_to_dict(cfg)
            )
            save_curriculum_sidecar(path, cfg, lib, runner)
            print(f"checkpoint saved: {path}")

    if pending is not None:
        global_step = drain_pending(pending)

    utilization.stop()
    path = ckpt_mod.save_checkpoint(cfg.train.data_dir, cfg.exp_name, epoch, state, config_to_dict(cfg))
    save_curriculum_sidecar(path, cfg, lib, runner)
    print(f"final checkpoint: {path}")


def save_curriculum_sidecar(ckpt_path: str, cfg: AppConfig, lib, runner) -> None:
    """Persist host-side curriculum state next to the checkpoint (PMCP
    termination history + phase-failure EMA; restored by mode_train)."""
    arrays = {"termination_history": lib.termination_history}
    if cfg.env.phase_curriculum:
        arrays["phase_fail"] = np.asarray(jax.device_get(runner.env_state.phase_fail))
    np.savez(ckpt_path + ".curriculum.npz", **arrays)


def make_act_fn(cfg: AppConfig, ppo, state):
    """Deterministic act_fn(obs, carry) -> (actions, carry) for eval/play
    (std clamped, reference phc_policy.py:51). Handles both MLP and LSTM
    policies (LSTM carry threads through `carry`, zero-initialized).

    The returned act_fn is jax-traceable (it runs inside the eval harness's
    jitted rollout scan). Under DP training the learner state is replicated
    over the mesh — localize it so eval (a single-device program) composes
    with it cleanly."""
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    if hasattr(leaf, "sharding") and len(leaf.sharding.device_set) > 1:
        state = jax.device_put(jax.device_get(state))
    if ppo.use_lstm:

        def act(obs, carry):
            normed = running_norm.normalize(state.obs_norm, obs)
            mu_t, _, new_carry = ppo.policy.apply(state.params, normed[None], carry)
            return mu_t[0], new_carry

        zeros = jnp.zeros((cfg.env.num_envs, ppo.lstm_hidden))
        return jax.jit(act), (zeros, zeros)

    def act(obs, carry):
        normed = running_norm.normalize(state.obs_norm, obs)
        mu, _ = ppo.policy.apply(state.params, normed)
        return mu, carry

    return jax.jit(act), None


def run_eval(cfg: AppConfig, lib, ppo, state, epoch: int = 0):
    """Deterministic-policy sweep over the motion corpus + PMCP update."""
    act_fn, carry0 = make_act_fn(cfg, ppo, state)
    results, by_motion, failed_keys = evaluate_policy(
        cfg.env,
        lib,
        act_fn,
        num_envs=cfg.env.num_envs,
        max_steps_cap=cfg.env.max_motion_len,
        eval_max_len=cfg.env.max_motion_len,
        act_carry_init=carry0,
    )
    # per-motion TSV (reference scripts/train.py:475-479)
    tsv = Path(cfg.train.data_dir) / cfg.exp_name / f"eval_by_motion_{epoch:06d}.tsv"
    write_by_motion_tsv(tsv, by_motion)
    # PMCP curriculum (reference humanoid_phc.py:1440-1454)
    if cfg.env.auto_pmcp:
        lib.update_hard_sampling_weight(failed_keys)
    elif cfg.env.auto_pmcp_soft:
        lib.update_soft_sampling_weight(failed_keys)
    if cfg.env.auto_pmcp or cfg.env.auto_pmcp_soft:
        # evidence that the curriculum is discriminating: weight entropy vs
        # uniform, and where the mass is going (top clips by weight)
        p = lib.sampling_prob
        nz = p[p > 0]
        results["pmcp/weight_entropy"] = float(-(nz * np.log(nz)).sum())
        results["pmcp/uniform_entropy"] = float(np.log(len(p)))
        top = np.argsort(-p)[:5]
        results["pmcp/top_clips"] = [
            [str(lib.motion_keys[i]), round(float(p[i]), 4)] for i in top
        ]
    return results


def mode_eval(cfg: AppConfig):
    lib, data, env, ppo = build(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(rng)
    if cfg.snapshot_path:
        from scripts.ckpt_snapshot import restore_into

        state = jax.device_put(restore_into(cfg.snapshot_path, jax.device_get(state)))
        print(f"restored policy snapshot {cfg.snapshot_path}")
    if cfg.checkpoint_path:
        state = ckpt_mod.load_checkpoint(cfg.checkpoint_path, state)
    results = run_eval(cfg, lib, ppo, state)
    print(json.dumps(results, indent=2))
    out = Path(cfg.train.data_dir) / cfg.exp_name / "eval_results.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))


def mode_play(cfg: AppConfig):
    """Deterministic rollout dumping body positions for offline visualization
    (the TPU-native analog of the reference's live viewer, render_env.py —
    see scripts/vis_motion_mj.py to replay the dump in MuJoCo's viewer)."""
    lib, data, env, ppo = build(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(rng)
    if cfg.checkpoint_path:
        state = ckpt_mod.load_checkpoint(cfg.checkpoint_path, state)

    from phc_tpu.physics import forward_kinematics

    act_fn, carry = make_act_fn(cfg, ppo, state)
    n_dump = min(cfg.env.num_envs, 16)  # dump a gallery, not just env 0

    from phc_tpu.motionlib import get_motion_state

    def _play_step(d, s, a, bf):
        s, out = henv.step(env, d, s, a, body_force=bf)
        frame = forward_kinematics(env.model, s.physics)
        # time-matched reference pose for ghost markers in the replay viewer
        # (the reference render_env's marker actors, render_env.py:306-335)
        times = s.progress.astype(jnp.float32) * env.control_dt + s.motion_times_start
        ref = get_motion_state(d, s.motion_ids, times, offset=s.motion_offset)
        return s, out.obs, frame.pos[:n_dump], frame.rot[:n_dump], ref.rg_pos[:n_dump]

    step_j = jax.jit(_play_step)
    rng, r = jax.random.split(rng)
    env_state, obs = jax.jit(lambda d, rr: henv.reset_all(env, d, rr))(data, r)

    # scripted perturbation schedule (reference render_env projectiles)
    pc = cfg.perturb
    prng = np.random.default_rng(cfg.train.seed)
    B, J = cfg.env.num_envs, env.num_bodies

    cur = {"bf": np.zeros((B, J, 3), np.float32)}

    def perturb_force(t: int) -> np.ndarray:
        if pc.interval <= 0:
            return cur["bf"]
        if t % pc.interval == 0:  # new impact: one random body, random heading
            bf = np.zeros((B, J, 3), np.float32)
            body = prng.integers(0, J, size=B)
            theta = prng.uniform(0, 2 * np.pi, size=B)
            bf[np.arange(B), body] = pc.force * np.stack(
                [np.cos(theta), np.sin(theta), np.zeros(B)], axis=-1
            ).astype(np.float32)
            cur["bf"] = bf
        in_window = (t % pc.interval) < pc.duration
        return cur["bf"] if in_window else np.zeros((B, J, 3), np.float32)

    frames, frames_rot, frames_ref = [], [], []
    for t in range(cfg.env.max_episode_length):
        actions, carry = act_fn(obs, carry)
        env_state, obs, pos, rot, ref_pos = step_j(data, env_state, actions, perturb_force(t))
        frames.append(np.asarray(pos))
        frames_rot.append(np.asarray(rot))
        frames_ref.append(np.asarray(ref_pos))
    out_path = Path(cfg.train.data_dir) / cfg.exp_name / "play_rollout.npz"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_path,
        body_pos=np.stack(frames),
        body_rot=np.stack(frames_rot),
        ref_pos=np.stack(frames_ref),
    )
    print(f"rollout saved: {out_path} ({len(frames)} frames x {n_dump} envs)")


def mode_sweep(cfg: AppConfig):
    """Random-search hyperparameter sweep — a working replacement for the
    reference's declared-but-unimplemented carbs sweep mode (reference
    `scripts/train.py:458-481` has no sweep branch; README:80-83). Samples
    the CARBS search space log-uniformly (ranges around the published
    optimum, README:102-113), runs a short training per trial, and ranks
    trials by mean imitation reward over the final quarter of epochs."""
    import dataclasses

    rng = np.random.default_rng(cfg.train.seed)
    sw = cfg.sweep
    results = []
    out_dir = Path(cfg.train.data_dir) / cfg.exp_name
    out_dir.mkdir(parents=True, exist_ok=True)

    def log_uniform(lo, hi):
        return float(10 ** rng.uniform(np.log10(lo), np.log10(hi)))

    for trial in range(sw.num_trials):
        sample = {
            "learning_rate": log_uniform(*sw.lr_range),
            "gamma": 1.0 - log_uniform(*sw.one_minus_gamma_range),
            "gae_lambda": log_uniform(*sw.lambda_range),
            "clip_coef": log_uniform(*sw.clip_range),
            "max_grad_norm": log_uniform(*sw.grad_norm_range),
        }
        tcfg = dataclasses.replace(
            cfg.train,
            **sample,
            total_timesteps=sw.steps_per_trial,
            eval_interval=0,
            checkpoint_interval=10**9,
            seed=cfg.train.seed + trial,
        )
        trial_cfg = dataclasses.replace(cfg, train=tcfg)
        print(f"--- sweep trial {trial}: {json.dumps(sample)}", flush=True)

        lib, data, env, ppo = build(trial_cfg)
        r = jax.random.PRNGKey(tcfg.seed)
        r, r_init, r_env = jax.random.split(r, 3)
        state = jax.jit(lambda rr: ppo_mod.init_state(ppo, rr))(r_init)
        runner = jax.jit(lambda d, rr: ppo_mod.init_runner(ppo, d, rr))(data, r_env)
        train_step = jax.jit(lambda d, s, rr: ppo_mod.train_step(ppo, d, s, rr))

        rewards = []
        global_step = 0.0
        while global_step < tcfg.total_timesteps:
            state, runner, losses = train_step(data, state, runner)
            rewards.append(float(np.asarray(losses["mean_reward"])))
            global_step = float(np.asarray(state.global_step))
        tail = rewards[-max(1, len(rewards) // 4):]
        score = float(np.mean(tail))
        results.append({"trial": trial, "score": score, **sample})
        print(f"trial {trial}: score {score:.4f}", flush=True)
        (out_dir / "sweep_results.json").write_text(
            json.dumps(sorted(results, key=lambda x: -x["score"]), indent=2)
        )

    best = max(results, key=lambda x: x["score"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    cfg = parse_cli()
    if cfg.mode == "train":
        mode_train(cfg)
    elif cfg.mode == "eval":
        mode_eval(cfg)
    elif cfg.mode == "play":
        mode_play(cfg)
    elif cfg.mode == "sweep":
        mode_sweep(cfg)
    else:
        raise SystemExit(f"unknown mode {cfg.mode}")
