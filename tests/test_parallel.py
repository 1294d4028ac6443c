"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phc_tpu.parallel import make_mesh, shard_train_step, DATA_AXIS


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = make_mesh()
    assert mesh.data_size * mesh.model_size == 8


def test_batch_sharding_placement():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(8, 2)
    xs = jax.device_put(x, mesh.batch_sharding())
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_full_train_step_on_mesh():
    """The driver's dryrun_multichip path: full PPO train step via shard_map
    over the data axis with pmean'd gradients."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_data_parallel_grads_replicated():
    """After one sharded train step, learner params must remain identical
    across devices (pmean keeps replicas in sync)."""
    import numpy as np

    from phc_tpu.config import EnvConfig, TrainConfig, PolicyConfig
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.motionlib import MotionLib
    from phc_tpu.rl import ppo as ppo_mod

    n = 8
    B, T = 2 * n, 2
    env_cfg = EnvConfig(num_envs=B, motion_file="/root/reference/sample_data/cmu_mocap_05_06.pkl")
    train_cfg = TrainConfig(batch_size=B * T, minibatch_size=B * T)
    pol_cfg = PolicyConfig(hidden_size=16, layer_sizes=(32,))
    lib = MotionLib(env_cfg.motion_file, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)

    mesh = make_mesh(data_axis=n, model_axis=1)
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))

    state = mesh.replicate(state)
    data_r = mesh.replicate(data)
    runner = mesh.shard_batch(runner)

    step_fn = shard_train_step(
        mesh,
        lambda state, runner, data, pmean_axis: ppo_mod.train_step(
            ppo, data, state, runner, pmean_axis=pmean_axis
        ),
    )
    state2, runner2, losses = step_fn(state, runner, data_r)

    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
    # replicated output: values identical on all devices
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(s, shards[0], atol=0)
    # the env state stays sharded over data
    es_leaf = runner2.env_state.physics.root_pos
    assert len(es_leaf.sharding.device_set) == n


def _tiny_setup(use_amp: bool = False, n_envs: int = 16, T: int = 4):
    import numpy as np

    from phc_tpu.config import EnvConfig, TrainConfig, PolicyConfig
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.motionlib import MotionLib
    from phc_tpu.rl import ppo as ppo_mod

    env_cfg = EnvConfig(
        num_envs=n_envs,
        motion_file="/root/reference/sample_data/cmu_mocap_05_06.pkl",
        use_amp_obs=use_amp,
    )
    train_cfg = TrainConfig(
        batch_size=n_envs * T, minibatch_size=n_envs * T // 2, update_epochs=2
    )
    pol_cfg = PolicyConfig(hidden_size=16, layer_sizes=(32,))
    lib = MotionLib(env_cfg.motion_file, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=n_envs)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(n_envs, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)
    return ppo, data


@pytest.mark.parametrize("use_amp", [False, True])
def test_dp_equivalence(use_amp):
    """DP=8 must reproduce the DP=1 update (SURVEY §4 'same seeds -> same
    update'): rollout noise derives from per-env PRNG streams and every
    update statistic reduces over the data axis, so the sharded step equals
    the single-device step up to float reassociation."""
    import numpy as np

    from phc_tpu.rl import ppo as ppo_mod

    ppo, data = _tiny_setup(use_amp=use_amp)

    def run(n_epochs, sharded):
        state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
        runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
        if sharded:
            mesh = make_mesh(data_axis=8, model_axis=1)
            state = mesh.replicate(state)
            runner = mesh.shard_batch(runner)
            data_p = mesh.replicate(data)
            step = shard_train_step(
                mesh,
                lambda state, runner, data, pmean_axis: ppo_mod.train_step(
                    ppo, data, state, runner, pmean_axis=pmean_axis
                ),
            )
            step = jax.jit(lambda s, r: step(s, r, data_p))
        else:
            step = jax.jit(lambda s, r: ppo_mod.train_step(ppo, data, s, r))
        losses = None
        for _ in range(n_epochs):
            state, runner, losses = step(state, runner)
        return state, losses

    s1, l1 = run(3, sharded=False)
    s8, l8 = run(3, sharded=True)

    for k in l1:
        np.testing.assert_allclose(
            np.asarray(l1[k]), np.asarray(l8[k]), rtol=2e-3, atol=2e-4, err_msg=f"loss {k}"
        )
    # params equal to float tolerance after 3 epochs
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        float(np.asarray(s1.global_step)), float(np.asarray(s8.global_step)), rtol=0
    )
