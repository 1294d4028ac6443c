"""Scan-based PPO trainer: one jitted program for rollout + GAE + update.

TPU-native re-design of the reference training runtime
(`/root/reference/puffer_phc/clean_pufferl/core.py:41-455` and
`structs.py:23-176`). The reference's epoch is a Python loop crossing the
host/device boundary every step (vecenv.recv/send, numpy GAE, indexed
minibatch gathers); here an epoch is:

    rollout  : lax.scan of (policy forward + env step) x T          (device)
    update   : GAE scan + update_epochs x minibatch scan over grads (device)

with zero host round trips. Truncated steps are handled by *weighting*
losses with the mask instead of dropping rows (the reference drops them at
`Experience.store`, `structs.py:113-128` — ragged; we keep static shapes).

All loss components replicate `core.py:299-359`: clipped PG, clipped value
loss, entropy, AMP discriminator BCE + replay, soft bound loss, L2-init
regularization, approx-KL early stop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phc_tpu.config import TrainConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.rl import policies, running_norm
from phc_tpu.rl.gae import compute_gae
from phc_tpu.rl.running_norm import RunningNormState


class Trajectory(NamedTuple):
    """Time-major (T, B, ...) rollout storage (device)."""

    obs: jax.Array
    actions: jax.Array
    logprobs: jax.Array
    values: jax.Array
    rewards: jax.Array
    dones: jax.Array  # early terminations only (GAE bootstraps through truncs)
    truncs: jax.Array
    amp_obs: jax.Array
    reward_raw: jax.Array  # (T, B, 5)
    diverged: jax.Array  # (T, B) nonfinite-guard triggers (diagnostic)
    lstm_h: jax.Array  # (T, B, H) critic-LSTM hidden at step entry (H=1 if MLP)
    lstm_c: jax.Array  # (T, B, H)


class RunnerState(NamedTuple):
    """Everything the rollout carries between epochs (batch-leading, shards
    over the data axis)."""

    env_state: henv.EnvState
    obs: jax.Array  # (B, obs)
    lstm_h: jax.Array  # (B, H) critic-LSTM carry (H=1 dummy if MLP)
    lstm_c: jax.Array  # (B, H)


class PPOState(NamedTuple):
    """Learner state (device pytree) — the checkpointable unit."""

    params: Any
    disc_params: Any
    opt_state: Any
    obs_norm: RunningNormState
    amp_norm: RunningNormState
    initial_params: Any  # L2-init anchor (regenerative reg, core.py:90-94)
    amp_replay: jax.Array  # (batch, amp_dim) discriminator replay buffer
    amp_replay_filled: jax.Array  # () bool
    rng: jax.Array
    global_step: jax.Array  # () int64-ish float
    epoch: jax.Array  # () int32


@dataclasses.dataclass(frozen=True)
class PPO:
    """Static trainer description."""

    cfg: TrainConfig
    env: henv.HumanoidEnv
    policy: Any  # flax Module
    disc: Optional[Any]
    rollout_steps: int
    optimizer: Any
    use_lstm: bool = False
    lstm_hidden: int = 1
    # optimizer-step-count -> learning rate (None = constant); exposed for
    # logging and tests (reference decays LR per epoch, train.py:352-356)
    lr_schedule: Any = None

    @property
    def num_envs(self) -> int:
        return self.env.num_envs

    @property
    def num_minibatches(self) -> int:
        return self.cfg.batch_size // self.cfg.minibatch_size


def make_ppo(cfg: TrainConfig, env: henv.HumanoidEnv, policy_cfg) -> PPO:
    use_lstm = bool(getattr(policy_cfg, "use_lstm", False))
    if use_lstm:
        variant = getattr(policy_cfg, "lstm_variant", "critic")
        cls = {"critic": policies.LSTMCriticPolicy, "actor": policies.LSTMActorPolicy}[variant]
        policy = cls(action_dim=env.num_dofs, hidden_size=policy_cfg.hidden_size)
    else:
        import jax.numpy as _jnp

        policy = policies.PHCPolicy(
            action_dim=env.num_dofs,
            hidden_size=policy_cfg.hidden_size,
            layer_sizes=tuple(policy_cfg.layer_sizes),
            dtype={"bf16": _jnp.bfloat16, "f32": None}[
                getattr(policy_cfg, "trunk_dtype", "bf16")
            ],
        )
    disc = policies.Discriminator(hidden_size=policy_cfg.hidden_size) if env.cfg.use_amp_obs else None
    rollout_steps = cfg.batch_size // env.num_envs
    assert rollout_steps * env.num_envs == cfg.batch_size, (
        f"batch_size {cfg.batch_size} must be a multiple of num_envs {env.num_envs}"
    )
    assert cfg.batch_size % cfg.minibatch_size == 0
    if use_lstm:
        assert rollout_steps % cfg.bptt_horizon == 0, (
            f"rollout {rollout_steps} must be a multiple of bptt_horizon {cfg.bptt_horizon}"
        )
    # LR exponential decay with a floor (reference scripts/train.py:352-356:
    # lr = learning_rate * max(exp(-lr_decay_rate * epoch), lr_decay_floor),
    # applied per epoch, active whenever lr_decay_rate > 0). The optimizer
    # steps update_epochs * num_minibatches times per epoch, so the schedule
    # maps optimizer-step count -> epoch.
    steps_per_epoch = (cfg.batch_size // cfg.minibatch_size) * cfg.update_epochs
    if cfg.lr_decay_rate > 0:

        def lr_schedule(count):
            epoch = jnp.floor(count / steps_per_epoch)
            # schedule clock starts at lr_decay_start_epoch (resume-with-
            # reset-LR: see TrainConfig.lr_decay_start_epoch)
            epoch = jnp.maximum(epoch - cfg.lr_decay_start_epoch, 0.0)
            decay = jnp.maximum(jnp.exp(-cfg.lr_decay_rate * epoch), cfg.lr_decay_floor)
            return cfg.learning_rate * decay

        lr = lr_schedule
    else:
        lr_schedule = None
        lr = cfg.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )
    return PPO(
        cfg=cfg,
        env=env,
        policy=policy,
        disc=disc,
        rollout_steps=rollout_steps,
        optimizer=tx,
        use_lstm=use_lstm,
        lstm_hidden=policy_cfg.hidden_size if use_lstm else 1,
        lr_schedule=lr_schedule,
    )


def init_state(ppo: PPO, rng: jax.Array) -> PPOState:
    env = ppo.env
    rng, r1, r2 = jax.random.split(rng, 3)
    obs_dim = env.num_obs
    if ppo.use_lstm:
        dummy_carry = (jnp.zeros((1, ppo.lstm_hidden)), jnp.zeros((1, ppo.lstm_hidden)))
        params = ppo.policy.init(r1, jnp.zeros((1, 1, obs_dim)), dummy_carry)
    else:
        params = ppo.policy.init(r1, jnp.zeros((1, obs_dim)))
    if ppo.disc is not None:
        disc_params = ppo.disc.init(r2, jnp.zeros((1, env.num_amp_obs)))
    else:
        disc_params = {}
    opt_state = ppo.optimizer.init((params, disc_params))
    amp_dim = env.num_amp_obs
    return PPOState(
        params=params,
        disc_params=disc_params,
        opt_state=opt_state,
        obs_norm=running_norm.init(obs_dim),
        amp_norm=running_norm.init(amp_dim),
        initial_params=jax.tree_util.tree_map(jnp.copy, params),
        amp_replay=jnp.zeros((ppo.cfg.batch_size, amp_dim) if ppo.disc is not None else (1, 1)),
        amp_replay_filled=jnp.zeros((), bool),
        rng=rng,
        global_step=jnp.zeros((), jnp.float32),
        epoch=jnp.zeros((), jnp.int32),
    )


def init_runner(ppo: PPO, data, rng: jax.Array) -> RunnerState:
    """Fresh runner: full env reset + zero LSTM carry."""
    env_state, obs = henv.reset_all(ppo.env, data, rng)
    B = obs.shape[0]
    zeros = jnp.zeros((B, ppo.lstm_hidden))
    return RunnerState(env_state=env_state, obs=obs, lstm_h=zeros, lstm_c=zeros)


# ---------------------------------------------------------------------------
# Rollout (hot loop #1, reference `evaluate` core.py:120-203)
# ---------------------------------------------------------------------------


def policy_forward(ppo: PPO, params, obs_norm: RunningNormState, obs, env_keys, deterministic=False):
    """env_keys: (B, 2) per-env PRNG keys — action noise is drawn from each
    env's own stream, so the rollout is invariant to how the batch is
    sharded across devices (the basis of the DP=N == DP=1 equivalence)."""
    normed = running_norm.normalize(obs_norm, obs)
    mu, value = ppo.policy.apply(params, normed)
    std = policies.action_std(ppo.env.num_dofs, deterministic)
    action = policies.sample_action_per_env(env_keys, mu, std)
    logp = policies.gaussian_logprob(mu, std, action)
    return action, logp, value, mu


def collect_rollout(
    ppo: PPO, data, state: PPOState, runner: RunnerState
) -> Tuple[RunnerState, Trajectory, jax.Array, dict]:
    """lax.scan of T policy+env steps.

    Returns (runner, traj, final_value, stats): the post-rollout runner, the
    time-major trajectory, the bootstrap value of the post-rollout obs, and
    scalar rollout statistics.

    Action noise comes from each env's own PRNG stream (EnvState.rng), not
    a batch-level key — the rollout is therefore bit-identical under any
    data sharding of the env batch. With the LSTM critic, the hidden state
    carried across steps is zeroed for done envs (reference `core.py:149-157`)
    and the carry at each step's entry is stored for BPTT segment
    initialization in the update.
    """
    # termination-distance anneal (see config.EnvConfig): loose early so
    # hard segments are not censored by early termination, tightening to
    # the parity threshold as training progresses
    ec = ppo.env.cfg
    if ec.termination_distance_start is not None:
        frac = jnp.clip(
            (state.epoch - ec.termination_anneal_start_epoch)
            / jnp.maximum(ec.termination_anneal_epochs, 1),
            0.0,
            1.0,
        )
        term_dist = ec.termination_distance_start + frac * (
            ec.termination_distance - ec.termination_distance_start
        )
    else:
        term_dist = None

    def step_fn(carry, _):
        env_state, obs, h, c = carry
        ks = jax.vmap(lambda k: jax.random.split(k))(env_state.rng)  # (B, 2, 2)
        act_keys = ks[:, 0]
        env_state = env_state._replace(rng=ks[:, 1])
        if ppo.use_lstm:
            normed = running_norm.normalize(state.obs_norm, obs)
            mu_t, value_t, (new_c, new_h) = ppo.policy.apply(
                state.params, normed[None], (c, h)
            )
            mu, value = mu_t[0], value_t[0]
            std = policies.action_std(ppo.env.num_dofs)
            action = policies.sample_action_per_env(act_keys, mu, std)
            logp = policies.gaussian_logprob(mu, std, action)
        else:
            action, logp, value, _ = policy_forward(
                ppo, state.params, state.obs_norm, obs, act_keys
            )
            new_h, new_c = h, c
        env_state, out = henv.step(
            ppo.env, data, env_state, action, termination_distance=term_dist
        )
        traj = Trajectory(
            obs=obs,
            actions=action,
            logprobs=logp,
            values=value,
            rewards=out.reward,
            dones=out.terminated.astype(jnp.float32),
            truncs=out.truncated.astype(jnp.float32),
            amp_obs=out.amp_obs,
            reward_raw=out.reward_raw,
            diverged=out.diverged.astype(jnp.float32),
            lstm_h=h,
            lstm_c=c,
        )
        # zero the carry for reset envs (reference core.py:149-157)
        reset = out.done[:, None]
        new_h = jnp.where(reset, 0.0, new_h)
        new_c = jnp.where(reset, 0.0, new_c)
        return (env_state, out.obs, new_h, new_c), traj

    init = (runner.env_state, runner.obs, runner.lstm_h, runner.lstm_c)
    (env_state, last_obs, h, c), traj = jax.lax.scan(
        step_fn, init, None, length=ppo.rollout_steps
    )
    # bootstrap value of the post-rollout obs (CleanRL's next_value), under
    # the same params/norm the rollout values used — consumed by GAE so the
    # window's tail bootstraps instead of being cut to zero
    normed_last = running_norm.normalize(state.obs_norm, last_obs)
    if ppo.use_lstm:
        _, v_last_t, _ = ppo.policy.apply(state.params, normed_last[None], (c, h))
        final_value = v_last_t[0]
    else:
        _, final_value = ppo.policy.apply(state.params, normed_last)
    stats = {
        "mean_reward": traj.rewards.mean(),
        "reward_raw": traj.reward_raw.mean(axis=(0, 1)),
        "termination_rate": traj.dones.mean(),
        "truncation_rate": traj.truncs.mean(),
        # nonfinite-physics guard triggers: must stay 0.0 in a healthy run
        # (nonzero means forced resets are polluting terminations — the
        # failure mode behind the r2 bf16-LHS bug, see engine.py Gram note)
        "diverged_rate": traj.diverged.mean(),
        # failure-phase curriculum observability: env-mean of the normalized
        # per-phase-bin termination EMA (which motion segments are hard NOW)
        "phase_fail_hist": (
            env_state.phase_fail
            / jnp.maximum(env_state.phase_fail.sum(axis=-1, keepdims=True), 1e-6)
        ).mean(axis=0),
    }
    if term_dist is not None:
        stats["termination_distance"] = term_dist
    runner = RunnerState(env_state=env_state, obs=last_obs, lstm_h=h, lstm_c=c)
    return runner, traj, final_value, stats


# ---------------------------------------------------------------------------
# Update (hot loop #2, reference `train` core.py:206-440)
# ---------------------------------------------------------------------------


def _adversarial_reward(ppo: PPO, disc_params, amp_norm, amp_obs):
    """r_amp = -log(max(1 - sigmoid(D), 1e-4)) (core.py:229-242)."""
    logits = ppo.disc.apply(disc_params, running_norm.normalize(amp_norm, amp_obs))
    prob = jax.nn.sigmoid(logits)
    return -jnp.log(jnp.maximum(1.0 - prob, 1e-4))


def _masked_mean(x, w, axis_name=None):
    """Masked mean, DP-correct.

    With axis_name set, each shard returns n_shards x (its contribution to
    the GLOBAL masked mean): pmean over shards — which is exactly what the
    grad/aux reduction applies — then equals the global masked mean, so
    DP=N reproduces DP=1 even when shards hold different numbers of valid
    (non-truncated) rows.
    """
    num = jnp.sum(x * w)
    den = jnp.sum(w)
    floor = 1.0
    if axis_name is not None:
        den = jax.lax.pmean(den, axis_name)  # = global_den / n_shards
        floor = 1.0 / jax.lax.psum(1, axis_name)
    return num / jnp.maximum(den, floor)


def _global_masked_mean(x, w, axis_name=None):
    """The global masked mean VALUE, identical on every shard (for uses that
    need the actual statistic locally, e.g. advantage normalization)."""
    num = jnp.sum(x * w)
    den = jnp.sum(w)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def update(
    ppo: PPO,
    state: PPOState,
    traj: Trajectory,
    amp_demo: Optional[jax.Array] = None,
    pmean_axis: Optional[str] = None,
    bootstrap_value: Optional[jax.Array] = None,
) -> Tuple[PPOState, dict]:
    """PPO update over update_epochs x num_minibatches, all under jit.

    pmean_axis: if set, gradients (and KL/statistics) are averaged across the
    named mesh axis (data parallelism — replaces the reference's
    single-process assumption, SURVEY.md §2.9).
    """
    cfg = ppo.cfg
    T, B = traj.rewards.shape
    mask = 1.0 - traj.truncs  # reference masks truncated steps out

    # running-norm updates (reference train.py:340-346, once per epoch);
    # batch statistics reduce over the data axis so every shard applies the
    # same (global) normalizer — required for DP=N == DP=1
    obs_norm = running_norm.update(state.obs_norm, traj.obs, axis_name=pmean_axis)
    amp_norm = state.amp_norm
    # advance the learner rng every epoch; its remaining consumers are the
    # AMP replay-buffer refresh and the minibatch permutation (rollout
    # action noise draws from per-env EnvState.rng, not from here)
    rng, _ = jax.random.split(state.rng)

    rewards = traj.rewards
    amp_replay = state.amp_replay
    amp_replay_filled = state.amp_replay_filled
    if ppo.disc is not None:
        amp_norm = running_norm.update(amp_norm, traj.amp_obs, axis_name=pmean_axis)
        r_amp = _adversarial_reward(ppo, state.disc_params, amp_norm, traj.amp_obs)
        # equal weighting of task + adversarial reward (core.py:248-251)
        rewards = rewards + r_amp
        # refresh 1% of the replay buffer with fresh agent obs (structs.py:165-176).
        # The replay buffer is part of the replicated learner state, so under
        # DP the refresh source must be the GLOBAL batch: all_gather the
        # shard-local agent obs and restore the (T, B_global) row order so
        # every shard writes the identical buffer (== the DP=1 buffer).
        amp_src = traj.amp_obs
        if pmean_axis is not None:
            g = jax.lax.all_gather(traj.amp_obs, pmean_axis)  # (n, T, B_local, A)
            amp_src = jnp.moveaxis(g, 0, 1).reshape(T, -1, g.shape[-1])
        flat_amp = amp_src.reshape(-1, amp_src.shape[-1])
        rng, r_rep = jax.random.split(rng)
        refresh = jax.random.uniform(r_rep, (flat_amp.shape[0],)) < 0.01
        refresh = jnp.where(amp_replay_filled, refresh, True)
        n = amp_replay.shape[0]
        amp_replay = jnp.where(refresh[:n, None], flat_amp[:n], amp_replay)
        amp_replay_filled = jnp.ones((), bool)

    advantages = compute_gae(
        traj.dones,
        traj.values,
        rewards,
        cfg.gamma,
        cfg.gae_lambda,
        cfg.gae_formula,
        bootstrap_value=bootstrap_value,
    )
    returns = advantages + traj.values

    # ---- minibatch layout: split envs into num_minibatches groups ----------
    nmb = ppo.num_minibatches
    envs_mb = B // nmb
    assert envs_mb * nmb == B

    def mb_view(x):
        # (T, B, ...) -> (nmb, T, envs_mb, ...): minibatch = env subgroup,
        # time structure preserved (needed for BPTT; the reference reaches
        # the same layout through its (env, step) sort, structs.py:133-145).
        # Groups are STRIDED over envs (group k = envs with e % nmb == k),
        # not contiguous: with Bl % nmb == 0, the strided partition is
        # invariant to block-sharding the env batch over the data axis, so
        # DP=N builds exactly the same global minibatches as DP=1 (the
        # contiguous partition does not — shard s's k-th contiguous group
        # is not a slice of the global k-th group).
        xs = x.reshape((T, envs_mb, nmb) + x.shape[2:])
        return jnp.moveaxis(xs, 2, 0)

    b_obs = mb_view(traj.obs)
    b_actions = mb_view(traj.actions)
    b_logprobs = mb_view(traj.logprobs)
    b_values = mb_view(traj.values)
    b_adv = mb_view(advantages)
    b_returns = mb_view(returns)
    b_mask = mb_view(mask)
    if ppo.disc is not None:
        b_amp = mb_view(traj.amp_obs)
        rng, r_perm = jax.random.split(rng)
        perm = jax.random.permutation(r_perm, amp_replay.shape[0])
        b_amp_replay = amp_replay[perm].reshape(nmb, -1, amp_replay.shape[-1])
        assert amp_demo is not None, "use_amp_obs requires the demo window batch"
    if ppo.use_lstm:
        b_lstm_h = mb_view(traj.lstm_h)
        b_lstm_c = mb_view(traj.lstm_c)
    std = policies.action_std(ppo.env.num_dofs)
    bptt = cfg.bptt_horizon

    def loss_fn(both_params, mb, amp_demo_mb):
        params, disc_params = both_params
        obs_n = running_norm.normalize(obs_norm, mb["obs"])  # (T, E, obs)
        if ppo.use_lstm:
            # BPTT: split time into horizon-length segments, each started
            # from the stored (detached) rollout carry at segment entry
            # (reference BPTT layout structs.py:133-145, bptt_horizon=8)
            E = obs_n.shape[1]
            S = T // bptt
            obs_seg = obs_n.reshape(S, bptt, E, -1).swapaxes(0, 1).reshape(bptt, S * E, -1)
            h0 = mb["lstm_h"][::bptt].reshape(S * E, -1)
            c0 = mb["lstm_c"][::bptt].reshape(S * E, -1)
            mu_seg, val_seg, _ = ppo.policy.apply(params, obs_seg, (c0, h0))
            mu = mu_seg.reshape(bptt, S, E, -1).swapaxes(0, 1).reshape(T, E, -1)
            newvalue = val_seg.reshape(bptt, S, E).swapaxes(0, 1).reshape(T, E)
        else:
            mu, newvalue = ppo.policy.apply(params, obs_n)
        newlogprob = policies.gaussian_logprob(mu, std, mb["actions"])
        entropy = policies.gaussian_entropy(std, ppo.env.num_dofs)

        logratio = newlogprob - mb["logprobs"]
        # Clamp before exp: with the fixed sigma=exp(-2.9), logprobs scale by
        # 1/(2 sigma^2) ~ 164 per dim, so a single outlier sample can push
        # logratio past 88 and exp() to inf — one inf gradient then turns
        # clip_by_global_norm into inf*(c/inf) = NaN for EVERY parameter
        # (the observed ~epoch-85 collapse). exp(15) ~ 3.3e6 keeps such
        # samples' gradients enormous-but-finite; the grad-norm clip (10,
        # reference core.py:361-377) then handles them. KL diagnostics use
        # the raw logratio.
        ratio = jnp.exp(jnp.minimum(logratio, 15.0))
        m = mb["mask"]

        old_approx_kl = _masked_mean(-logratio, m, pmean_axis)
        approx_kl = _masked_mean((ratio - 1.0) - logratio, m, pmean_axis)
        clipfrac = _masked_mean(
            (jnp.abs(ratio - 1.0) > cfg.clip_coef).astype(jnp.float32), m, pmean_axis
        )

        adv = mb["adv"]
        if cfg.norm_adv:
            # normalization statistics must be the GLOBAL minibatch moments
            # (adv is a constant here, so no gradient flows through the psum)
            amean = _global_masked_mean(adv, m, pmean_axis)
            astd = jnp.sqrt(_global_masked_mean((adv - amean) ** 2, m, pmean_axis))
            adv = (adv - amean) / (astd + 1e-8)

        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1.0 - cfg.clip_coef, 1.0 + cfg.clip_coef)
        pg_loss = _masked_mean(jnp.maximum(pg1, pg2), m, pmean_axis)

        if cfg.clip_vloss:
            v_unclipped = (newvalue - mb["returns"]) ** 2
            v_clipped_val = mb["values"] + jnp.clip(
                newvalue - mb["values"], -cfg.vf_clip_coef, cfg.vf_clip_coef
            )
            v_clipped = (v_clipped_val - mb["returns"]) ** 2
            v_loss = _masked_mean(jnp.maximum(v_unclipped, v_clipped), m, pmean_axis)
        else:
            v_loss = _masked_mean((newvalue - mb["returns"]) ** 2, m, pmean_axis)

        mean_bound_loss = policies.bound_loss(mu)

        loss = pg_loss - cfg.ent_coef * entropy + v_loss * cfg.vf_coef
        loss = loss + cfg.bound_coef * mean_bound_loss

        disc_loss = jnp.zeros(())
        disc_agent_acc = jnp.zeros(())
        disc_demo_acc = jnp.zeros(())
        if ppo.disc is not None:
            amp_flat_mb = mb["amp"].reshape(-1, mb["amp"].shape[-1])  # per-shard rows
            replay_mb = mb["amp_replay"]  # REPLICATED rows (identical on all shards)
            local_logits = ppo.disc.apply(
                disc_params, running_norm.normalize(amp_norm, amp_flat_mb)
            )
            replay_logits = ppo.disc.apply(
                disc_params, running_norm.normalize(amp_norm, replay_mb)
            )
            demo_logits = ppo.disc.apply(disc_params, running_norm.normalize(amp_norm, amp_demo_mb))
            bce_el = lambda logits, target: (
                jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )

            def shared_local_mean(local, shared):
                """Mean over the GLOBAL agent row set = (union of per-shard
                local rows) + (one copy of the replicated replay rows).
                Returns n_shards x the shard's contribution, so the pmean
                applied to aux/grads reproduces the DP=1 value exactly
                (plain per-shard means would overweight the replay rows)."""
                if pmean_axis is None:
                    return (jnp.sum(local) + jnp.sum(shared)) / (local.size + shared.size)
                n = jax.lax.psum(1, pmean_axis)
                denom = local.size * n + shared.size
                return (jnp.sum(local) * n + jnp.sum(shared)) / denom

            disc_loss = 0.5 * (
                shared_local_mean(bce_el(local_logits, 0.0), bce_el(replay_logits, 0.0))
                + jnp.mean(bce_el(demo_logits, 1.0))
            )
            loss = loss + cfg.disc_coef * disc_loss
            disc_agent_acc = shared_local_mean(
                (local_logits < 0).astype(jnp.float32), (replay_logits < 0).astype(jnp.float32)
            )
            disc_demo_acc = jnp.mean((demo_logits > 0).astype(jnp.float32))

        l2_reg = jnp.zeros(())
        if cfg.l2_reg_coef > 0:
            diffs = jax.tree_util.tree_map(
                lambda p, p0: jnp.mean((p - p0) ** 2), params, state.initial_params
            )
            l2_reg = jax.tree_util.tree_reduce(jnp.add, diffs)
            loss = loss + cfg.l2_reg_coef * l2_reg

        aux = {
            "policy_loss": pg_loss,
            "value_loss": v_loss,
            "entropy": entropy,
            "old_approx_kl": old_approx_kl,
            "approx_kl": approx_kl,
            "clipfrac": clipfrac,
            "mean_bound_loss": mean_bound_loss,
            "disc_loss": disc_loss,
            "disc_agent_acc": disc_agent_acc,
            "disc_demo_acc": disc_demo_acc,
            "l2_init_reg_loss": l2_reg,
        }
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_step(carry, idx):
        params, disc_params, opt_state, stop = carry
        mb = {
            "obs": b_obs[idx],
            "actions": b_actions[idx],
            "logprobs": b_logprobs[idx],
            "values": b_values[idx],
            "adv": b_adv[idx],
            "returns": b_returns[idx],
            "mask": b_mask[idx],
        }
        if ppo.disc is not None:
            mb["amp"] = b_amp[idx]
            mb["amp_replay"] = b_amp_replay[idx]
            amp_demo_mb = amp_demo
        else:
            amp_demo_mb = None
        if ppo.use_lstm:
            mb["lstm_h"] = b_lstm_h[idx]
            mb["lstm_c"] = b_lstm_c[idx]
        (loss, aux), grads = grad_fn((params, disc_params), mb, amp_demo_mb)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            aux = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, pmean_axis), aux)

        updates, new_opt_state = ppo.optimizer.update(grads, opt_state, (params, disc_params))
        new_params, new_disc = optax.apply_updates((params, disc_params), updates)

        # target-KL early stop (core.py:400-402): once KL exceeds the target,
        # skip all remaining minibatch updates (masked, shapes static)
        if cfg.target_kl is not None:
            new_stop = stop | (aux["approx_kl"] > cfg.target_kl)
        else:
            new_stop = stop
        # nonfinite-grad guard: a poisoned minibatch (inf/NaN loss or grads)
        # must never write NaN into params/opt state — skip just this
        # minibatch and keep training (belt over the ratio clamp above)
        gnorm = optax.global_norm(grads)
        skip = stop | ~jnp.isfinite(gnorm)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(skip, b, a), new, old
        )
        params = keep(new_params, params)
        disc_params = keep(new_disc, disc_params)
        opt_state = keep(new_opt_state, opt_state)
        aux["grad_norm"] = gnorm
        aux["nonfinite_grad_skips"] = (~jnp.isfinite(gnorm)).astype(jnp.float32)
        return (params, disc_params, opt_state, new_stop), aux

    # epoch x minibatch scan (static trip count: update_epochs * nmb)
    mb_order = jnp.tile(jnp.arange(nmb), cfg.update_epochs)
    carry = (state.params, state.disc_params, state.opt_state, jnp.zeros((), bool))
    (params, disc_params, opt_state, _), auxes = jax.lax.scan(minibatch_step, carry, mb_order)

    losses = jax.tree_util.tree_map(lambda x: x.mean(), auxes)

    def _gvar(x):
        # variance over the GLOBAL batch (moment form so shards reduce)
        m1, m2 = jnp.mean(x), jnp.mean(x * x)
        if pmean_axis is not None:
            m1 = jax.lax.pmean(m1, pmean_axis)
            m2 = jax.lax.pmean(m2, pmean_axis)
        return m2 - m1 * m1

    y_true = returns
    var_y = _gvar(y_true)
    losses["explained_variance"] = jnp.where(
        var_y == 0, jnp.nan, 1.0 - _gvar(y_true - traj.values) / var_y
    )

    step_inc = jnp.sum(mask)
    if pmean_axis is not None:
        # count the GLOBAL env steps, not the shard's
        step_inc = jax.lax.psum(step_inc, pmean_axis)
    new_state = state._replace(
        params=params,
        disc_params=disc_params,
        opt_state=opt_state,
        obs_norm=obs_norm,
        amp_norm=amp_norm,
        amp_replay=amp_replay,
        amp_replay_filled=amp_replay_filled,
        rng=rng,
        global_step=state.global_step + step_inc,
        epoch=state.epoch + 1,
    )
    return new_state, losses


def train_step(
    ppo: PPO,
    data,
    state: PPOState,
    runner: RunnerState,
    pmean_axis: Optional[str] = None,
):
    """One full epoch: rollout + update. Jit (or shard_map) this.

    All rollout randomness derives from per-env PRNG streams (EnvState.rng)
    and all update statistics reduce over `pmean_axis`, so a DP=N sharded
    step reproduces the DP=1 step up to float reassociation
    (tests/test_parallel.py::test_dp_equivalence).
    """
    runner, traj, final_value, roll_stats = collect_rollout(ppo, data, state, runner)
    if ppo.disc is not None:
        # fresh demo windows each epoch (original-PHC fetch_amp_obs_demo
        # behavior; see henv.sample_amp_obs_demo). Keys derive per-env so the
        # demo set is sharding-invariant.
        demo_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED))(runner.env_state.rng)
        amp_demo = henv.sample_amp_obs_demo_keyed(ppo.env, data, demo_keys)
    else:
        amp_demo = None
    state, losses = update(
        ppo, state, traj, amp_demo=amp_demo, pmean_axis=pmean_axis, bootstrap_value=final_value
    )
    if pmean_axis is not None:
        roll_stats = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, pmean_axis), roll_stats)
    return state, runner, {**losses, **roll_stats}
