"""Typed configuration tree + minimal CLI overrides.

Same shape as the reference's tyro dataclass tree
(`/root/reference/puffer_phc/config.py:9-196`) — one frozen-ish dataclass
per subsystem, every hyperparameter with the reference's defaults — plus
TPU-specific knobs (mesh axes, physics substeps, contact parameters).
tyro is not available in this image, so `parse_cli` implements the same
`--train.learning-rate 3e-4` override surface with argparse-free parsing.
"""

from __future__ import annotations

import dataclasses
import enum
import sys
from dataclasses import dataclass, field
from typing import Optional, Tuple


class StateInit(enum.Enum):
    """Reset strategies (reference `envs/state_init.py:4-8`)."""

    Default = "Default"
    Start = "Start"
    Random = "Random"
    Hybrid = "Hybrid"


@dataclass
class RewardConfig:
    """Imitation reward shaping (reference `config.py:23-37`)."""

    k_pos: float = 100.0
    k_rot: float = 10.0
    k_vel: float = 0.1
    k_ang_vel: float = 0.1
    w_pos: float = 0.5
    w_rot: float = 0.3
    w_vel: float = 0.1
    w_ang_vel: float = 0.1
    imitation_reward_dim: int = 4
    full_body_reward: bool = True
    use_power_reward: bool = True


@dataclass
class RobotConfig:
    """Humanoid options (reference `config.py:39-70`)."""

    humanoid_type: str = "smpl"
    has_self_collision: bool = True
    has_upright_start: bool = True
    has_dof_subset: bool = True
    freeze_hand: bool = True
    freeze_toe: bool = True
    bias_offset: bool = False
    # Shape-conditioned self obs (reference `common.py:96-97` has_smpl_params
    # branch; `config.py` robot.has_shape_obs — constant False in the fork,
    # so off by default for parity). When on, the 11-dim SMPL shape vector
    # [gender, betas[:10]] of each env's assigned motion (motion_bodies,
    # reference `humanoid_shapes[:, :-6]`, humanoid_phc.py:968) is appended
    # to the self obs: 934 -> 945 total.
    has_shape_obs: bool = False


@dataclass
class PhysicsConfig:
    """Simulator parameters (TPU engine; reference analog
    `envs/isaacgym_env.py:6-41`)."""

    sim_timestep: float = 1.0 / 60.0
    control_freq_inv: int = 2  # physics substeps per control step
    # "frozen": build+factor the system once per control step, run substeps
    # as TGS-style velocity iterations (engine._step_frozen); "full": rebuild
    # everything per substep.
    substep_mode: str = "frozen"
    contact_stiffness: float = 2.0e4
    contact_damping: float = 6.0e2
    friction: float = 1.0


@dataclass
class EnvConfig:
    """Environment configuration (reference `config.py:72-135`)."""

    name: str = "humanoid_phc"
    motion_file: str = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
    num_envs: int = 4096

    clip_actions: bool = True
    use_amp_obs: bool = False
    enable_early_termination: bool = True
    termination_distance: float = 0.25
    # Termination-distance anneal (phc_tpu extension; None = reference
    # parity). The any-body 0.25 m training threshold CENSORS hard
    # segments: an episode entering a fast segment can terminate a few
    # steps in, so the policy never experiences completing it and gets no
    # reward gradient toward the apex (diagnosed on the sample clip's
    # high kick, experiments/tpu_learn_r3/FINDINGS.md). When set, the
    # training threshold starts at `termination_distance_start` and
    # anneals linearly to `termination_distance` over
    # `termination_anneal_epochs` epochs beginning at
    # `termination_anneal_start_epoch` (eval thresholds are unaffected).
    termination_distance_start: Optional[float] = None
    termination_anneal_epochs: int = 1000
    termination_anneal_start_epoch: int = 0
    max_episode_length: int = 300

    auto_pmcp: bool = False
    auto_pmcp_soft: bool = True
    # Time-window failure curriculum (phc_tpu extension; off = reference
    # parity). PMCP reweights whole motions, which cannot target a hard
    # SEGMENT of a motion (e.g. the sample clip's high kick). When on,
    # reset times are drawn from a per-(env, phase-bin) mix of uniform and
    # the in-jit termination-phase EMA (humanoid_env.EnvState.phase_fail).
    phase_curriculum: bool = False
    phase_bins: int = 16
    phase_curriculum_alpha: float = 0.7  # weight on the failure histogram
    phase_fail_decay: float = 0.999  # per-control-step EMA decay (~21-epoch half-life)
    # seconds subtracted from the termination time before phase-binning, so
    # curriculum resets start upstream of the failure (the distance check
    # fires a drift-detection delay after the hard segment begins)
    phase_curriculum_lead: float = 0.3

    kp_scale: float = 1.0
    kd_scale: float = 1.0
    log_interval: int = 32

    rew_power_coef: float = 0.0005
    state_init: StateInit = StateInit.Random

    local_root_obs: bool = True
    root_height_obs: bool = True

    add_obs_noise: bool = False
    obs_noise_std: float = 0.1
    add_action_noise: bool = False
    action_noise_std: float = 0.05

    seq_motions: bool = False
    min_motion_len: int = 5
    max_motion_len: int = 600
    hybrid_init_prob: float = 0.5

    num_amp_obs_steps: int = 10
    amp_root_height_obs: bool = True

    # frame capacity of the packed motion buffer (None = exact first load)
    motion_frame_capacity: Optional[int] = None

    robot: RobotConfig = field(default_factory=RobotConfig)
    reward: RewardConfig = field(default_factory=RewardConfig)
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)


@dataclass
class PolicyConfig:
    """Actor/critic MLP sizes (reference `config.py:137-142`)."""

    hidden_size: int = 512
    layer_sizes: Tuple[int, ...] = (2048, 1536, 1024, 1024, 512)
    # trunk matmul compute dtype: "bf16" halves activation traffic (params
    # and heads stay fp32); "f32" for exactness experiments
    trunk_dtype: str = "bf16"
    use_lstm: bool = False
    # with use_lstm: "critic" = LSTM critic + MLP actor (lstm_policy.py:25-87),
    # "actor" = LSTM actor + MLP critic (lstm_policy.py:91-148)
    lstm_variant: str = "critic"


@dataclass
class MeshConfig:
    """Device mesh for multi-chip scaling (TPU-native addition; the reference
    is single-GPU — SURVEY.md §2.9). data axis shards the env batch; model
    axis optionally shards MLP hidden dims."""

    data_axis: int = -1  # -1 = all devices
    model_axis: int = 1


@dataclass
class TrainConfig:
    """PPO hyperparameters (reference `config.py:153-196`)."""

    seed: int = 1

    total_timesteps: int = 500_000_000

    data_dir: str = "experiments"
    checkpoint_interval: int = 1500
    motion_resample_interval: int = 500
    eval_interval: int = 1500

    batch_size: int = 131072
    minibatch_size: int = 32768

    learning_rate: float = 1e-4
    # exponential LR decay per epoch with a floor (reference
    # scripts/train.py:352-356); active whenever lr_decay_rate > 0.
    # lr_decay_start_epoch offsets the schedule clock: a run resumed from a
    # late checkpoint can restart the decay from its own first epoch
    # (epochs before the offset see the full learning_rate), which the r3c
    # experiment found necessary for continued progress on a new corpus.
    lr_decay_rate: float = 1.5e-4
    lr_decay_floor: float = 0.2
    lr_decay_start_epoch: int = 0

    update_epochs: int = 4
    bptt_horizon: int = 8
    gae_lambda: float = 0.2
    gamma: float = 0.98
    clip_coef: float = 0.01
    norm_adv: bool = True
    target_kl: Optional[float] = None
    vf_coef: float = 1.2
    clip_vloss: bool = True
    vf_clip_coef: float = 0.2
    max_grad_norm: float = 10.0
    ent_coef: float = 0.0
    disc_coef: float = 5.0
    bound_coef: float = 10.0
    l2_reg_coef: float = 0.0

    # GAE formula. "textbook" is the behavioral-parity default: the
    # reference's Cython kernel (`c_gae.pyx:24-31`) indexes r[t+1]/done[t+1]
    # because its Experience rows are recv-aligned (reward lands one row
    # after its action), which on same-index rollout storage IS the textbook
    # formula. "reference_raw" replicates the raw index arithmetic instead —
    # on our same-index Trajectory that shifts credit one step and
    # bootstraps terminal deltas from the next episode's reset value (it
    # rewards falling; kept only for kernel-level comparisons, see
    # rl/gae.py docstring).
    gae_formula: str = "textbook"


@dataclass
class SweepConfig:
    """Random-search hyperparameter sweep over the CARBS search space the
    reference documents but never implemented (`scripts/train.py:458-481`
    has no sweep branch; README:80-83 'not fully supported yet'). Ranges
    follow the published sweep outcome's neighborhoods (README:102-113)."""

    num_trials: int = 16
    steps_per_trial: int = 2_000_000
    # log-uniform ranges
    lr_range: Tuple[float, float] = (1e-5, 1e-3)
    one_minus_gamma_range: Tuple[float, float] = (0.005, 0.05)
    lambda_range: Tuple[float, float] = (0.05, 0.95)
    clip_range: Tuple[float, float] = (0.003, 0.1)
    grad_norm_range: Tuple[float, float] = (1.0, 50.0)


@dataclass
class PerturbConfig:
    """Scripted projectile-style perturbations for mode_play robustness
    checks — the headless analog of the reference viewer's keyboard-
    triggered projectiles (`render_env.py:105-126,273-295`)."""

    interval: int = 0  # apply a perturbation every N control steps (0 = off)
    duration: int = 3  # control steps each perturbation lasts
    force: float = 800.0  # Newtons, applied at one random body, random direction


@dataclass
class AppConfig:
    mode: str = "train"  # train | play | eval | sweep
    exp_name: str = "phc_tpu"
    checkpoint_path: Optional[str] = None
    # committed .npz policy snapshot (scripts/ckpt_snapshot.py): restores
    # params + running-norm stats + step counters into the fresh state
    # (optimizer state re-initializes; pair with
    # train.lr_decay_start_epoch when continuing a decayed schedule)
    snapshot_path: Optional[str] = None
    perturb: PerturbConfig = field(default_factory=PerturbConfig)
    env: EnvConfig = field(default_factory=EnvConfig)
    policy: PolicyConfig = field(default_factory=PolicyConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    sweep: SweepConfig = field(default_factory=SweepConfig)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _coerce(current, raw: str):
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, StateInit):
        return StateInit[raw]
    if isinstance(current, tuple):
        cast = float if any(isinstance(v, float) for v in current) else int
        return tuple(cast(x) for x in raw.strip("()[] ").split(",") if x)
    if current is None:
        # best-effort: try int, float, then string
        for cast in (int, float):
            try:
                return cast(raw)
            except ValueError:
                pass
        return raw
    return raw


def _set_dotted(cfg, dotted: str, raw: str):
    parts = dotted.replace("-", "_").split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    name = parts[-1]
    if not hasattr(obj, name):
        raise SystemExit(f"unknown config field: {dotted}")
    setattr(obj, name, _coerce(getattr(obj, name), raw))


def parse_cli(argv=None) -> AppConfig:
    """Parse `--a.b.c value` / `--a.b.c=value` overrides into an AppConfig.

    Same override surface as the reference's tyro CLI (README:86-89):
    e.g. `--env.motion-file data/x.pkl --train.learning-rate 3e-4`.
    """
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = AppConfig()
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected positional argument: {arg}")
        key = arg[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"missing value for --{key}")
            val = argv[i + 1]
            i += 2
        _set_dotted(cfg, key, val)
    return cfg


def config_to_dict(cfg) -> dict:
    """Nested dict view (for checkpoints / logging)."""
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, enum.Enum):
        return cfg.name
    return cfg
