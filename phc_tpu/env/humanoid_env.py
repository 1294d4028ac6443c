"""HumanoidPHC as pure functions: fully-jittable step with masked resets.

TPU-native re-design of the reference environment
(`/root/reference/puffer_phc/envs/humanoid_phc.py:46-1455`). The reference
is an imperative class juggling Isaac Gym buffers, indexed sub-batch resets
and a host-side motion-state cache; here the environment is a static
`HumanoidEnv` description plus two pure functions over pytrees:

    reset_all(env, motion_data, rng)          -> EnvState
    step(env, motion_data, state, actions)    -> (EnvState, StepOutput)

Resets happen *inside* step via `jnp.where` masking (no shape dynamism, no
host round trip — SURVEY.md §7 'reset-inside-jit'), and the reference-motion
query is shared by reward/termination/obs exactly like the reference's
memoized cache (`humanoid_phc.py:875-897`) — but by construction, since the
step is a single traced program.

Eval-mode differences (relaxed termination distance, mean-based fall check,
reduced reset-body set, `humanoid_phc.py:1424-1454`) are static fields, so
train and eval compile as two specializations of the same code.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu import body_sets
from phc_tpu import transforms as T
from phc_tpu.config import EnvConfig, StateInit
from phc_tpu.env import kernels
from phc_tpu.motionlib import MotionData, MotionState, get_motion_state, sample_time_interval
from phc_tpu.physics import (
    PhysicsModel,
    PhysicsState,
    build_pd_action_offset_scale,
    build_smpl_model,
    forward_kinematics,
    dof_positions,
    dof_velocities,
    state_from_parts,
)
from phc_tpu.physics import engine as phys_engine


class EnvState(NamedTuple):
    """Per-env dynamic state (device pytree)."""

    physics: PhysicsState
    motion_ids: jax.Array  # (B,) int32 motion each env imitates (dynamic,
    #   like the reference's _sampled_motion_ids; shards with the batch)
    progress: jax.Array  # (B,) int32 steps since reset
    motion_times_start: jax.Array  # (B,) f32 motion time at reset
    motion_offset: jax.Array  # (B, 3) world-position offset of the reference
    amp_obs_hist: jax.Array  # (B, S, A) AMP obs ring, [:, 0] = newest
    amp_obs_demo: jax.Array  # (B, S, A) demo AMP windows for the discriminator
    rng: jax.Array  # (B, 2) per-env PRNG keys (shards over the data axis)
    phase_fail: jax.Array  # (B, K) EMA of termination counts per motion-phase
    #   bin — drives the time-window failure curriculum (phc_tpu extension
    #   beyond the reference's per-motion PMCP, which is a no-op within one
    #   motion). Each env imitates a fixed motion, so a per-env table IS the
    #   per-(motion, phase) table and shards trivially with the batch.


class StepOutput(NamedTuple):
    obs: jax.Array  # (B, 934)
    reward: jax.Array  # (B,)
    done: jax.Array  # (B,) bool: episode ended (terminated OR truncated)
    terminated: jax.Array  # (B,) bool: early termination (fall)
    truncated: jax.Array  # (B,) bool: motion exhausted
    reward_raw: jax.Array  # (B, 5) [pos, rot, vel, ang_vel, power]
    amp_obs: jax.Array  # (B, S*A) flattened AMP window (zeros if disabled)
    mpjpe: jax.Array  # (B,) mean per-joint position error this step (meters)
    diverged: jax.Array  # (B,) bool: nonfinite-physics guard fired (forced reset)


@dataclasses.dataclass(frozen=True)
class HumanoidEnv:
    """Static environment description (trace-time constant).

    Deliberately contains NO per-env arrays: all batch-shaped data lives in
    EnvState so the same HumanoidEnv works at any shard-local batch size
    under shard_map.
    """

    cfg: EnvConfig
    model: PhysicsModel
    # static index arrays
    key_body_ids: np.ndarray
    reset_body_ids: np.ndarray
    track_body_ids: np.ndarray
    dof_subset: np.ndarray
    freeze_dofs: np.ndarray
    pd_offset: np.ndarray
    pd_scale: np.ndarray
    # eval-mode statics (reference toggle_eval_mode)
    eval_mode: bool = False

    @property
    def num_envs(self) -> int:
        return self.cfg.num_envs

    @property
    def num_bodies(self) -> int:
        return self.model.num_bodies

    @property
    def num_dofs(self) -> int:
        return len(self.pd_offset)

    @property
    def num_obs(self) -> int:
        # 358 self + 576 imitation (reference `humanoid_phc.py:458-467`);
        # the self part loses the root-height slot when root_height_obs=False
        J = self.num_bodies
        self_dim = (1 if self.cfg.root_height_obs else 0) + J * 15 - 3
        if self.cfg.robot.has_shape_obs:
            self_dim += 11  # [gender, betas[:10]] (reference common.py:96-97)
        # per-tracked-body imitation width: 3 diff_pos + 6 diff_rot + 3
        # diff_vel + 3 diff_ang_vel + 3 local_ref_pos + 6 local_ref_rot = 24
        # (equals J only for the 24-body SMPL skeleton)
        return self_dim + len(self.track_body_ids) * 24

    @property
    def num_amp_obs_per_step(self) -> int:
        # [12|13] + 6*per-subset-joint + subset dofs + 3*key bodies
        # (reference :469-476; root height slot gated by amp_root_height_obs)
        n_sub = len(self.dof_subset) // 3
        base = 13 if self.cfg.amp_root_height_obs else 12
        return base + 6 * n_sub + len(self.dof_subset) + 3 * len(self.key_body_ids)

    @property
    def num_amp_obs(self) -> int:
        return self.cfg.num_amp_obs_steps * self.num_amp_obs_per_step

    @property
    def termination_distance(self) -> float:
        # eval relaxes 0.25 -> 0.5 (reference `humanoid_phc.py:1429`)
        return 0.5 if self.eval_mode else self.cfg.termination_distance

    @property
    def control_dt(self) -> float:
        return self.model.control_dt


def make_env(cfg: EnvConfig, motion_ids=None, eval_mode: bool = False) -> HumanoidEnv:
    """motion_ids is accepted for backward compatibility and ignored — the
    per-env motion assignment is dynamic state (pass it to reset_all)."""
    model = build_smpl_model(
        kp_scale=cfg.kp_scale,
        kd_scale=cfg.kd_scale,
        dt=cfg.physics.sim_timestep,
        substeps=cfg.physics.control_freq_inv,
        substep_mode=cfg.physics.substep_mode,
        contact_stiffness=cfg.physics.contact_stiffness,
        contact_damping=cfg.physics.contact_damping,
        friction=cfg.physics.friction,
        self_collision=cfg.robot.has_self_collision,
    )
    pd_offset, pd_scale = build_pd_action_offset_scale(model, bias_offset=cfg.robot.bias_offset)
    reset_bodies = body_sets.EVAL_BODIES if eval_mode else body_sets.RESET_BODIES
    if cfg.robot.has_dof_subset:
        dof_subset = body_sets.dof_subset_indices()
    else:
        # has_dof_subset=False: AMP obs consume all dofs (common.py:244)
        dof_subset = np.arange(3 * (model.num_bodies - 1), dtype=np.int64)
    return HumanoidEnv(
        cfg=cfg,
        model=model,
        key_body_ids=body_sets.body_ids(body_sets.KEY_BODIES),
        reset_body_ids=body_sets.body_ids(reset_bodies),
        track_body_ids=body_sets.body_ids(body_sets.TRACK_BODIES),
        dof_subset=dof_subset,
        freeze_dofs=body_sets.freeze_dof_indices(),
        pd_offset=pd_offset,
        pd_scale=pd_scale,
        eval_mode=eval_mode,
    )


# ---------------------------------------------------------------------------
# Reference-state sampling and resets
# ---------------------------------------------------------------------------


def _ref_physics_state(ref: MotionState) -> PhysicsState:
    """Physics state matching a reference motion state (reset-to-reference,
    reference `_set_env_state` humanoid_phc.py:899-918)."""
    return state_from_parts(
        root_pos=ref.root_pos,
        root_rot=ref.root_rot,
        dof_pos=ref.dof_pos,
        root_vel=ref.root_vel,
        root_ang_vel_world=ref.root_ang_vel,
        dof_vel=ref.dof_vel,
    )


def _default_physics_state(env: HumanoidEnv, batch: int, keys: jax.Array) -> PhysicsState:
    """T-pose spawn at char height with random xy (reference
    `humanoid_phc.py:340-343` + `_reset_default` :686-690).
    keys: (B, 2) per-env PRNG keys."""
    st = phys_engine.default_state(env.model, batch, height=0.89)
    xy = jax.vmap(lambda k: jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0))(keys)
    return st._replace(root_pos=st.root_pos.at[:, :2].add(xy))


def _sample_reset_times(
    env: HumanoidEnv, data: MotionData, keys: jax.Array, motion_ids, phase_fail=None
) -> jax.Array:
    """keys: (B, 2) per-env PRNG keys. phase_fail: optional (B, K) failure
    EMA enabling the time-window curriculum (see EnvState.phase_fail)."""
    cfg = env.cfg
    if env.eval_mode or cfg.state_init == StateInit.Start:
        return jnp.zeros(motion_ids.shape, jnp.float32)
    lengths = data.motion_lengths[motion_ids]
    dt = 1.0 / 30.0
    u = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(keys)  # (B, 2)
    if cfg.phase_curriculum and phase_fail is not None:
        # mix uniform with the failure histogram: bin ~ Categorical(
        # (1-a)/K + a * normalize(fail)), then uniform within the bin.
        # Inverse-CDF keeps it one cumsum + compare (K is tiny).
        K = phase_fail.shape[-1]
        w = phase_fail + 1e-6
        w = (1.0 - cfg.phase_curriculum_alpha) / K + cfg.phase_curriculum_alpha * (
            w / w.sum(axis=-1, keepdims=True)
        )
        cdf = jnp.cumsum(w, axis=-1)
        cdf = cdf / cdf[:, -1:]
        bins = (u[:, 0:1] > cdf).sum(axis=-1)  # (B,) in [0, K)
        phase = (bins.astype(jnp.float32) + u[:, 1]) / K
    else:
        # parity path: grid-snapped uniform phase (reference `_sample_time`
        # humanoid_phc.py:838-841), one independent stream per env
        phase = u[:, 0]
    return jnp.floor(phase * lengths / dt) * dt


def _amp_obs_from_motion(env: HumanoidEnv, data: MotionData, motion_ids, motion_times) -> jax.Array:
    """AMP obs of a reference state (reference `_get_amp_obs` :819-836)."""
    st = get_motion_state(data, motion_ids, motion_times)
    key_pos = st.rg_pos[:, jnp.asarray(env.key_body_ids)]
    return kernels.compute_amp_obs(
        st.root_pos,
        st.root_rot,
        st.root_vel,
        st.root_ang_vel,
        st.dof_pos,
        st.dof_vel,
        key_pos,
        jnp.asarray(env.dof_subset),
        root_height_obs=env.cfg.amp_root_height_obs,
        upright=env.cfg.robot.has_upright_start,
    )


def _amp_window_from_motion(env: HumanoidEnv, data: MotionData, motion_ids, motion_times) -> jax.Array:
    """(B, S, A) AMP history window ending at motion_times (newest first),
    sampled from the motion library (reference `_init_amp_obs_ref`
    :803-817 — the demo buffer fed to the discriminator)."""
    S = env.cfg.num_amp_obs_steps
    dt = env.control_dt
    B = motion_ids.shape[0]
    steps = jnp.arange(S, dtype=jnp.float32) * dt  # 0, dt, ... (S-1)dt back
    times = jnp.maximum(motion_times[:, None] - steps[None, :], 0.0)  # (B, S)
    flat_ids = jnp.repeat(motion_ids, S)
    flat_times = times.reshape(-1)
    amp = _amp_obs_from_motion(env, data, flat_ids, flat_times)
    return amp.reshape(B, S, -1)


# ---------------------------------------------------------------------------
# Observation assembly
# ---------------------------------------------------------------------------


def _compute_obs(env: HumanoidEnv, frame, ref: MotionState) -> jax.Array:
    """[self obs (358) | imitation obs (576)] (reference
    `_compute_observations` humanoid_phc.py:935-959)."""
    self_obs = kernels.compute_self_obs(
        frame.pos,
        frame.rot,
        frame.lin_vel,
        frame.ang_vel,
        root_height_obs=env.cfg.root_height_obs,
        local_root_obs=env.cfg.local_root_obs,
        upright=env.cfg.robot.has_upright_start,
        # 11-dim [gender, betas[:10]] of the env's assigned motion
        # (reference humanoid_shapes[:, :-6], humanoid_phc.py:968)
        shape_params=ref.motion_bodies[:, :-6] if env.cfg.robot.has_shape_obs else None,
    )
    tb = jnp.asarray(env.track_body_ids)
    task_obs = kernels.compute_imitation_obs(
        frame.pos[:, 0],
        frame.rot[:, 0],
        frame.pos[:, tb],
        frame.rot[:, tb],
        frame.lin_vel[:, tb],
        frame.ang_vel[:, tb],
        ref.rg_pos[:, tb],
        ref.rb_rot[:, tb],
        ref.body_vel[:, tb],
        ref.body_ang_vel[:, tb],
    )
    return jnp.concatenate([self_obs, task_obs], axis=-1)


def _amp_obs_from_sim(env: HumanoidEnv, physics: PhysicsState, frame) -> jax.Array:
    kb = jnp.asarray(env.key_body_ids)
    return kernels.compute_amp_obs(
        frame.pos[:, 0],
        frame.rot[:, 0],
        frame.lin_vel[:, 0],
        frame.ang_vel[:, 0],
        dof_positions(physics),
        dof_velocities(physics),
        frame.pos[:, kb],
        jnp.asarray(env.dof_subset),
        root_height_obs=env.cfg.amp_root_height_obs,
        upright=env.cfg.robot.has_upright_start,
    )


# ---------------------------------------------------------------------------
# Public API: reset_all / step
# ---------------------------------------------------------------------------


def reset_all(
    env: HumanoidEnv, data: MotionData, rng: jax.Array, motion_ids=None
) -> Tuple[EnvState, jax.Array]:
    """Reset every env; returns (state, obs).

    motion_ids: (B,) assignment of loaded motions to envs (defaults to
    arange % num_motions). Includes the reference's stabilization
    double-reset (`humanoid_phc.py:97-101`): set state, run one physics
    step, set state again.
    """
    if motion_ids is None:
        motion_ids = jnp.arange(env.num_envs, dtype=jnp.int32) % data.num_motions
    motion_ids = jnp.asarray(motion_ids, jnp.int32)
    B = motion_ids.shape[0]
    env_keys = jax.random.split(rng, B)  # one independent stream per env
    ks = jax.vmap(lambda k: jax.random.split(k, 4))(env_keys)  # (B, 4, 2)
    env_keys, r_time, r_hybrid, r_xy = ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]

    times = _sample_reset_times(env, data, r_time, motion_ids)
    ref = get_motion_state(data, motion_ids, times)
    physics = _ref_physics_state(ref)

    if env.cfg.state_init == StateInit.Default:
        physics = _default_physics_state(env, B, r_xy)
        times = jnp.zeros(B)
    elif env.cfg.state_init == StateInit.Hybrid:
        use_ref = jax.vmap(lambda k: jax.random.bernoulli(k, env.cfg.hybrid_init_prob))(r_hybrid)
        default = _default_physics_state(env, B, r_xy)
        physics = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use_ref.reshape((-1,) + (1,) * (a.ndim - 1)), a, b), physics, default
        )
        times = jnp.where(use_ref, times, 0.0)

    # stabilization double reset
    pd_hold = dof_positions(physics)
    stepped, _ = phys_engine.step(env.model, physics, pd_hold)
    del stepped  # state is re-imposed; the extra step only flushes transients
    # (with a pure-functional engine the re-imposition is exact, so the
    # reference's "squash any remaining weirdness" step is a no-op by
    # construction; kept here as documentation of the behavioral contract)

    amp_dim = env.num_amp_obs_per_step
    S = env.cfg.num_amp_obs_steps
    if env.cfg.use_amp_obs:
        amp_hist = _amp_window_from_motion(env, data, motion_ids, times)
        amp_demo = amp_hist
    else:
        amp_hist = jnp.zeros((B, S, amp_dim))
        amp_demo = amp_hist

    state = EnvState(
        physics=physics,
        motion_ids=motion_ids,
        progress=jnp.zeros(B, jnp.int32),
        motion_times_start=times,
        motion_offset=jnp.zeros((B, 3)),
        amp_obs_hist=amp_hist,
        amp_obs_demo=amp_demo,
        rng=env_keys,
        phase_fail=jnp.zeros((B, env.cfg.phase_bins)),
    )

    frame = forward_kinematics(env.model, physics)
    obs = _compute_obs(env, frame, get_motion_state(data, motion_ids, times))
    return state, obs


def step(
    env: HumanoidEnv,
    data: MotionData,
    state: EnvState,
    actions: jax.Array,
    body_force: Optional[jax.Array] = None,
    termination_distance: Optional[jax.Array] = None,
) -> Tuple[EnvState, StepOutput]:
    """One control step: PD-actuated physics, reward, termination, masked
    auto-reset, next obs. Fully jittable; no host round trips.

    body_force: optional (B, J, 3) world forces at body origins for
    perturbation-robustness evaluation (the reference viewer's projectiles,
    `render_env.py:273-295`).
    termination_distance: optional traced scalar overriding the static
    threshold (the termination-distance anneal, config.EnvConfig)."""
    cfg = env.cfg
    B = state.progress.shape[0]
    motion_ids = state.motion_ids

    ks = jax.vmap(lambda k: jax.random.split(k, 6))(state.rng)  # (B, 6, 2)
    env_keys, r_noise, r_time, r_hybrid, r_xy, r_on = (
        ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3], ks[:, 4], ks[:, 5]
    )

    # ---- actions -> PD targets (reference humanoid_phc.py:105-128) --------
    if cfg.clip_actions:
        actions = jnp.clip(actions, -1.0, 1.0)
    if cfg.add_action_noise:
        noise = jax.vmap(lambda k: jax.random.normal(k, actions.shape[1:]))(r_noise)
        actions = actions + cfg.action_noise_std * noise
    pd_target = jnp.asarray(env.pd_offset) + jnp.asarray(env.pd_scale) * actions
    if cfg.robot.freeze_hand or cfg.robot.freeze_toe:
        pd_target = pd_target.at[:, jnp.asarray(env.freeze_dofs)].set(0.0)

    # ---- physics -----------------------------------------------------------
    physics, sim_info = phys_engine.step(env.model, state.physics, pd_target, body_force)
    progress = state.progress + 1

    # Nonfinite-state guard: if an env's simulation state ever goes NaN/inf
    # (the engine's velocity/force caps make this near-impossible, but a
    # single poisoned env would NaN the entire PPO update), force-terminate
    # exactly that env — the masked auto-reset below replaces its physics
    # state with a fresh reference state, and its reward is zeroed. This is
    # the jit-safe analog of how Isaac-Gym frameworks survive PhysX blowups
    # (reset on divergence); NaN never crosses into the learner.
    bad = ~(
        jnp.all(jnp.isfinite(physics.vel), axis=-1)
        & jnp.all(jnp.isfinite(physics.root_pos), axis=-1)
        & jnp.all(jnp.isfinite(physics.joint_quat.reshape(B, -1)), axis=-1)
    )
    physics = jax.tree_util.tree_map(
        lambda x: jnp.where(
            bad.reshape((-1,) + (1,) * (x.ndim - 1)),
            jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0),
            x,
        ),
        physics,
    )

    frame = forward_kinematics(env.model, physics)

    # ---- shared reference-motion query (reference's memoized cache) -------
    motion_times = progress.astype(jnp.float32) * env.control_dt + state.motion_times_start
    ref = get_motion_state(data, motion_ids, motion_times, offset=state.motion_offset)

    # ---- reward (reference `_compute_reward` :1228-1303) -------------------
    # full_body_reward=False rewards only the tracked-body subset
    # (reference humanoid_phc.py:1256-1293)
    rw = cfg.reward
    if rw.full_body_reward:
        rb_sel = slice(None)
    else:
        rb_sel = jnp.asarray(env.track_body_ids)
    reward, reward_raw4 = kernels.compute_imitation_reward(
        frame.pos[:, rb_sel],
        frame.rot[:, rb_sel],
        frame.lin_vel[:, rb_sel],
        frame.ang_vel[:, rb_sel],
        ref.rg_pos[:, rb_sel],
        ref.rb_rot[:, rb_sel],
        ref.body_vel[:, rb_sel],
        ref.body_ang_vel[:, rb_sel],
        k_pos=rw.k_pos,
        k_rot=rw.k_rot,
        k_vel=rw.k_vel,
        k_ang_vel=rw.k_ang_vel,
        w_pos=rw.w_pos,
        w_rot=rw.w_rot,
        w_vel=rw.w_vel,
        w_ang_vel=rw.w_ang_vel,
    )
    if rw.use_power_reward:
        power_r = kernels.compute_power_reward(
            sim_info["dof_torque"], dof_velocities(physics), progress, cfg.rew_power_coef
        )
        reward = reward + power_r
    else:
        power_r = jnp.zeros(B)
    # reward_raw layout: imitation components (imitation_reward_dim wide,
    # reference humanoid_phc.py:562-569) followed by the power term
    reward_raw = jnp.concatenate(
        [reward_raw4[:, : rw.imitation_reward_dim], power_r[:, None]], axis=-1
    )

    # ---- termination / truncation (reference `_compute_reset` :1311-1333) --
    pass_time = motion_times >= data.motion_lengths[motion_ids]
    rb = jnp.asarray(env.reset_body_ids)
    term_dist = (
        jnp.asarray(env.termination_distance, jnp.float32)
        if termination_distance is None
        else jnp.asarray(termination_distance, jnp.float32)
    )
    done, terminated = kernels.compute_im_reset(
        frame.pos[:, rb],
        ref.rg_pos[:, rb],
        pass_time,
        progress,
        term_dist,
        use_mean=env.eval_mode,
        enable_early_termination=cfg.enable_early_termination,
    )
    # diverged envs are failures: terminate (no bootstrap), zero this step's
    # reward so no nonfinite value reaches GAE/losses
    done = done | bad
    terminated = terminated | bad
    reward = jnp.where(bad, 0.0, reward)
    reward_raw = jnp.where(bad[:, None], 0.0, reward_raw)
    truncated = pass_time & ~terminated

    # per-step tracking error (reference eval extras :159-169)
    mpjpe = jnp.linalg.norm(frame.pos - ref.rg_pos, axis=-1).mean(axis=-1)
    mpjpe = jnp.where(bad, 10.0, mpjpe)

    # ---- failure-phase curriculum table (pure elementwise, no scatter:
    # per-env one-hot over K bins on the VPU) --------------------------------
    if cfg.phase_curriculum:
        K = cfg.phase_bins
        lengths_cur = data.motion_lengths[motion_ids]
        # Bin at (motion_times - lead): the termination-distance check fires
        # a drift-detection delay AFTER the hard segment begins, so without
        # the lead, curriculum resets would land at/after the unrecoverable
        # point. The lead places resets upstream of the failure window.
        fail_times = jnp.maximum(motion_times - cfg.phase_curriculum_lead, 0.0)
        bins = jnp.clip(
            (fail_times / jnp.maximum(lengths_cur, 1e-6) * K).astype(jnp.int32), 0, K - 1
        )
        onehot = jax.nn.one_hot(bins, K)
        # only genuine tracking failures drive the curriculum — nonfinite-
        # physics forced resets (`bad`) are numeric events, not policy ones
        policy_fail = (terminated & ~bad).astype(jnp.float32)
        phase_fail = state.phase_fail * cfg.phase_fail_decay + onehot * policy_fail[:, None]
    else:
        phase_fail = state.phase_fail

    # ---- masked auto-reset --------------------------------------------------
    new_times = _sample_reset_times(env, data, r_time, motion_ids, phase_fail)
    ref_new = get_motion_state(data, motion_ids, new_times)
    reset_physics = _ref_physics_state(ref_new)
    if cfg.state_init == StateInit.Default:
        reset_physics = _default_physics_state(env, B, r_xy)
        new_times = jnp.zeros(B)
    elif cfg.state_init == StateInit.Hybrid:
        use_ref = jax.vmap(lambda k: jax.random.bernoulli(k, cfg.hybrid_init_prob))(r_hybrid)
        default = _default_physics_state(env, B, r_xy)
        reset_physics = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use_ref.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
            reset_physics,
            default,
        )
        new_times = jnp.where(use_ref, new_times, 0.0)

    def mask_like(new, old):
        m = done.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    physics = jax.tree_util.tree_map(mask_like, reset_physics, physics)
    progress = jnp.where(done, 0, progress)
    times_start = jnp.where(done, new_times, state.motion_times_start)
    motion_offset = jnp.where(done[:, None], 0.0, state.motion_offset)

    # ---- next obs (post-reset, like the reference's reset-then-observe) ----
    frame2 = forward_kinematics(env.model, physics)
    obs_times = jnp.where(
        done, times_start, (progress + 1).astype(jnp.float32) * env.control_dt + times_start
    )
    # NOTE: the reference computes obs against the NEXT frame's reference
    # state (`_compute_task_obs` :1061-1065 "+1"); for freshly reset envs it
    # observes the reset reference state itself (`_reset_envs` :663-671).
    ref_obs = get_motion_state(data, motion_ids, obs_times, offset=motion_offset)
    obs = _compute_obs(env, frame2, ref_obs)
    if cfg.add_obs_noise and not env.eval_mode:
        onoise = jax.vmap(lambda k: jax.random.normal(k, obs.shape[1:]))(r_on)
        obs = obs + cfg.obs_noise_std * onoise

    # ---- AMP observation history (reference :154-157, 1339-1359) -----------
    if cfg.use_amp_obs:
        curr_amp = _amp_obs_from_sim(env, physics, frame2)
        amp_hist = jnp.concatenate([curr_amp[:, None], state.amp_obs_hist[:, :-1]], axis=1)
        # freshly reset envs get their history from the motion library
        reset_window = _amp_window_from_motion(env, data, motion_ids, times_start)
        amp_hist = jnp.where(done[:, None, None], reset_window, amp_hist)
        amp_demo = jnp.where(done[:, None, None], reset_window, state.amp_obs_demo)
        amp_flat = amp_hist.reshape(B, -1)
    else:
        amp_hist = state.amp_obs_hist
        amp_demo = state.amp_obs_demo
        amp_flat = jnp.zeros((B, env.num_amp_obs))

    new_state = EnvState(
        physics=physics,
        motion_ids=motion_ids,
        progress=progress,
        motion_times_start=times_start,
        motion_offset=motion_offset,
        amp_obs_hist=amp_hist,
        amp_obs_demo=amp_demo,
        rng=env_keys,
        phase_fail=phase_fail,
    )
    out = StepOutput(
        obs=obs,
        reward=reward,
        done=done,
        terminated=terminated,
        truncated=truncated,
        reward_raw=reward_raw,
        amp_obs=amp_flat,
        mpjpe=mpjpe,
        diverged=bad,
    )
    return new_state, out


def fetch_amp_obs_demo(env: HumanoidEnv, state: EnvState) -> jax.Array:
    """Demo AMP windows for discriminator training (reference
    `fetch_amp_obs_demo` humanoid_phc.py:1358-1359 — the fork's demo buffer
    is frozen at each env's last reset, :813-817)."""
    return state.amp_obs_demo.reshape(state.amp_obs_demo.shape[0], -1)


def sample_amp_obs_demo_keyed(
    env: HumanoidEnv, data: MotionData, env_keys: jax.Array
) -> jax.Array:
    """FRESH demo AMP windows, one per key: new (motion, time) samples every
    call. env_keys: (batch, 2) per-row PRNG keys — per-row derivation makes
    the demo set invariant to data sharding (DP equivalence).

    The reference fork's demo buffer only refreshes on env resets
    (`humanoid_phc.py:813-817`), so the discriminator's positive
    distribution goes stale between resets; upstream PHC's
    `fetch_amp_obs_demo` re-samples windows every train call. This
    implements the upstream behavior: motion ids uniform over the loaded
    batch, window end-times uniform over [window, length] so the full
    S-step history lies inside the clip. Returns (batch, S*A) flattened.
    """
    S = env.cfg.num_amp_obs_steps
    dt = env.control_dt
    batch = env_keys.shape[0]
    u2 = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(env_keys)  # (B, 2)
    ids = jnp.minimum((u2[:, 0] * data.num_motions).astype(jnp.int32), data.num_motions - 1)
    lengths = data.motion_lengths[ids]
    trunc = dt * (S - 1)
    times = jnp.minimum(trunc + u2[:, 1] * jnp.maximum(lengths - trunc, 0.0), lengths)
    window = _amp_window_from_motion(env, data, ids, times)
    return window.reshape(batch, -1)


def sample_amp_obs_demo(
    env: HumanoidEnv, data: MotionData, rng: jax.Array, batch: int
) -> jax.Array:
    """Single-key convenience wrapper over `sample_amp_obs_demo_keyed`."""
    return sample_amp_obs_demo_keyed(env, data, jax.random.split(rng, batch))
