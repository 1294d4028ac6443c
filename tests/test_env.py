"""End-to-end environment tests on the shipped sample motion (tiny batch)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phc_tpu.config import EnvConfig, StateInit
from phc_tpu.env import make_env, reset_all, step
from phc_tpu.motionlib import MotionLib

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
B = 4


@pytest.fixture(scope="module")
def setup():
    cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL, state_init=StateInit.Random)
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = make_env(cfg, motion_ids=np.arange(B) % lib.num_unique_motions)
    return env, data


def test_obs_dims(setup):
    env, data = setup
    assert env.num_obs == 934  # reference runtime assert humanoid_phc.py:467
    assert env.num_amp_obs_per_step == 196
    assert env.num_amp_obs == 1960
    assert env.num_dofs == 69


def test_reset_and_step(setup):
    env, data = setup
    state, obs = reset_all(env, data, jax.random.PRNGKey(0))
    assert obs.shape == (B, 934)
    assert np.isfinite(np.asarray(obs)).all()

    step_j = jax.jit(lambda s, a: step(env, data, s, a))
    actions = jnp.zeros((B, 69))
    state2, out = step_j(state, actions)
    assert out.obs.shape == (B, 934)
    assert out.reward.shape == (B,)
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    # reward is in (0, 1] + small power penalty range
    r = np.asarray(out.reward)
    assert np.all(r > -1.0) and np.all(r <= 1.01)
    assert np.asarray(state2.progress).tolist() == [1] * B or np.asarray(out.done).any()


def test_reset_to_reference_tracks_initially(setup):
    """Right after a reset-to-reference, the pose matches the motion, so the
    imitation reward should be near its maximum."""
    env, data = setup
    state, obs = reset_all(env, data, jax.random.PRNGKey(1))
    step_j = jax.jit(lambda s, a: step(env, data, s, a))
    _, out = step_j(state, jnp.zeros((B, 69)))
    # one physics step from the reference state: position error stays small
    assert np.asarray(out.mpjpe).mean() < 0.2
    assert np.asarray(out.reward).mean() > 0.3


def test_episode_progress_and_masked_reset(setup):
    env, data = setup
    state, obs = reset_all(env, data, jax.random.PRNGKey(2))
    step_j = jax.jit(lambda s, a: step(env, data, s, a))
    rng = jax.random.PRNGKey(3)
    saw_done = False
    for i in range(8):
        rng, r = jax.random.split(rng)
        actions = 0.5 * jax.random.normal(r, (B, 69))
        state, out = step_j(state, actions)
        if bool(np.asarray(out.done).any()):
            saw_done = True
            done = np.asarray(out.done)
            prog = np.asarray(state.progress)
            assert np.all(prog[done] == 0)  # reset envs restart progress
    assert np.isfinite(np.asarray(out.obs)).all()
    # random actions on a humanoid should eventually fall -> termination
    # (not asserted strictly; 8 steps may not be enough, but state stays sane)


def test_eval_mode_env_builds(setup):
    _, data = setup
    cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL)
    env_eval = make_env(cfg, motion_ids=np.zeros(B, np.int64), eval_mode=True)
    assert env_eval.termination_distance == 0.5
    assert len(env_eval.reset_body_ids) == 20  # EVAL_BODIES excludes hands+toes
    state, obs = reset_all(env_eval, data, jax.random.PRNGKey(0))
    # eval resets start at motion time 0
    np.testing.assert_allclose(np.asarray(state.motion_times_start), 0.0)


def test_shape_obs_contract():
    """Flag-gated SMPL shape obs (reference common.py:96-97 has_smpl_params;
    off by default for parity with the fork's constant has_shape_obs=False).
    When on: num_obs 934 -> 945 and the 11 extra self-obs slots carry the
    env's motion [gender, betas[:10]] (reference humanoid_phc.py:968)."""
    import dataclasses

    cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL, state_init=StateInit.Random)
    cfg = dataclasses.replace(
        cfg, robot=dataclasses.replace(cfg.robot, has_shape_obs=True)
    )
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = make_env(cfg, motion_ids=np.arange(B) % lib.num_unique_motions)
    assert env.num_obs == 945

    state, obs = reset_all(env, data, jax.random.PRNGKey(0))
    assert obs.shape == (B, 945)
    step_j = jax.jit(lambda s, a: step(env, data, s, a))
    state2, out = step_j(state, jnp.zeros((B, 69)))
    assert out.obs.shape == (B, 945)
    assert np.isfinite(np.asarray(out.obs)).all()

    # the shape slots sit at the end of the self-obs block (358:369) and
    # equal the assigned motions' [gender, betas[:10]]
    expect = np.asarray(data.motion_bodies)[np.asarray(state2.motion_ids)][:, :-6]
    got = np.asarray(out.obs[:, 358:369])
    np.testing.assert_allclose(got, expect, atol=1e-6)
