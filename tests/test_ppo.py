"""End-to-end PPO trainer tests (tiny nets + tiny env batch)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phc_tpu.config import EnvConfig, PolicyConfig, TrainConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib
from phc_tpu.rl import ppo as ppo_mod

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
B, T = 8, 8


def make_setup(use_amp=False):
    env_cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL, use_amp_obs=use_amp)
    train_cfg = TrainConfig(batch_size=B * T, minibatch_size=B * T // 2)
    pol_cfg = PolicyConfig(hidden_size=32, layer_sizes=(64, 32))
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)
    return lib, data, env, ppo


def test_train_step_runs_and_updates():
    lib, data, env, ppo = make_setup()
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))

    train_step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, runner, losses = train_step(data, state, runner)

    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite: {v}"
    # params changed, counters advanced
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert int(state.epoch) == 1
    assert float(state.global_step) > 0
    # obs-norm stats were updated from the batch
    assert float(state.obs_norm.count) == 2.0

    # a second step works from the carried state (no retrace errors)
    state, runner, losses = train_step(data, state, runner)
    assert int(state.epoch) == 2
    assert np.isfinite(np.asarray(losses["policy_loss"]))


@pytest.mark.parametrize("variant", ["critic", "actor"])
def test_train_step_lstm_variants(variant):
    """Both recurrent policies (reference `lstm_policy.py:25-87` critic-LSTM
    and :91-148 actor-LSTM) run a full train step with BPTT."""
    env_cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL)
    train_cfg = TrainConfig(batch_size=B * T, minibatch_size=B * T // 2, bptt_horizon=4)
    pol_cfg = PolicyConfig(hidden_size=16, use_lstm=True, lstm_variant=variant)
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)

    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
    train_step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, runner, losses = train_step(data, state, runner)
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite: {v}"
    assert not np.allclose(p0, jax.tree_util.tree_leaves(state.params)[0])


def test_train_step_with_amp_discriminator():
    lib, data, env, ppo = make_setup(use_amp=True)
    assert ppo.disc is not None
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))

    train_step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))
    state, runner, losses = train_step(data, state, runner)
    assert np.isfinite(float(losses["disc_loss"]))
    assert 0.0 <= float(losses["disc_agent_acc"]) <= 1.0
    assert bool(state.amp_replay_filled)
    # amp norm updated too
    assert float(state.amp_norm.count) == 2.0


def test_reward_improves_on_single_clip():
    """Actual learning test (r1 VERDICT item 7): 60 PPO epochs on the sample
    clip must (a) stay NaN-free throughout and (b) raise the mean imitation
    reward by a clear margin over the start — the minimum end-to-end
    learning slice of SURVEY.md §7 build order 4. Deterministic (fixed
    seeds, CPU backend), measured headroom ~2x the asserted margin."""
    nB, nT = 64, 32
    env_cfg = EnvConfig(num_envs=nB, motion_file=SAMPLE_PKL)
    train_cfg = TrainConfig(batch_size=nB * nT, minibatch_size=nB * nT // 4)
    pol_cfg = PolicyConfig(hidden_size=64, layer_sizes=(128, 64))
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=nB)
    env = henv.make_env(env_cfg)
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)

    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
    train_step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))

    rewards, terms = [], []
    for _ in range(60):
        state, runner, losses = train_step(data, state, runner)
        rewards.append(float(losses["mean_reward"]))
        terms.append(float(losses["termination_rate"]))
    # (a) NaN-watch: every epoch finite, params finite at the end
    assert np.isfinite(rewards).all()
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(state.params))
    # (b) learning: the strongest early signal is survival — the fall rate
    # must drop by a clear margin (measured 0.45 -> 0.31 at these seeds);
    # per-step reward must also improve (smaller margin: longer episodes
    # reach harder motion segments, diluting the per-step mean)
    t_first, t_last = np.mean(terms[:10]), np.mean(terms[-10:])
    assert t_last < t_first - 0.08, (t_first, t_last)
    first, last = np.mean(rewards[:10]), np.mean(rewards[-10:])
    assert last > first + 0.005, (first, last)
