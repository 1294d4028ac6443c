"""AMASS evaluation harness: sweep every motion through the env batch.

Port of the reference's `EvalStats` + deterministic `rollout`
(`/root/reference/scripts/train.py:75-257, 384-430`): motions are loaded
longest-first in batches of num_envs, each batch is rolled out with the
deterministic policy until every motion has either finished or terminated
(fall > 0.5 m mean deviation => failure), and per-motion MPJPE/success are
accumulated. Produces the reference's `eval/*` metrics dict and the failed
keys that drive the PMCP curriculum (`motion_lib.update_*_sampling_weight`).

The batch-advance logic (more envs than motions on the last batch,
termination bookkeeping) follows `train.py:119-137` — SURVEY.md §7 flags it
as fiddly, so it is kept host-side and simple; only the per-step env rollout
is jitted.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib
from phc_tpu.physics import forward_kinematics
from phc_tpu.runtime.metrics import compute_metrics_lite


def evaluate_policy(
    env_cfg,
    lib: MotionLib,
    act_fn: Callable[[jax.Array], jax.Array],
    num_envs: int,
    max_steps_cap: Optional[int] = None,
    verbose: bool = True,
) -> Tuple[Dict[str, float], Dict[str, np.ndarray], list]:
    """Evaluate `act_fn` (obs -> deterministic actions) over all motions.

    Returns (results dict with eval/* keys, per-motion results, failed_keys).
    """
    num_unique = lib.num_unique_motions
    was_eval = lib.im_eval
    lib.im_eval = True
    # length-sort for efficient batching (reference load_data im_eval path)
    order = np.argsort([-len(c["pose_quat_global"]) for c in lib._motion_clips])

    env = henv.make_env(env_cfg, motion_ids=np.arange(num_envs, dtype=np.int64), eval_mode=True)
    step_j = jax.jit(lambda d, s, a: henv.step(env, d, s, a))
    reset_j = jax.jit(lambda d, r: henv.reset_all(env, d, r))

    terminate_hist = []
    mpjpe_per_motion = []
    pred_pos_all, gt_pos_all = [], []
    played_steps_all, motion_len_all = [], []

    rng = jax.random.PRNGKey(0)

    start = 0
    batch_i = 0
    while start < num_unique:
        ids = order[start : start + num_envs]
        pad = num_envs - len(ids)
        real = len(ids)
        if pad > 0:
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad)])

        data = lib.load_motions(num_motions=num_envs, sample_idxes=ids, randomize_heading=False)
        motion_steps = lib.get_motion_num_steps(data)
        if max_steps_cap is not None:
            motion_steps = np.minimum(motion_steps, max_steps_cap)
        max_len = int(motion_steps.max())

        rng, r = jax.random.split(rng)
        state, obs = reset_j(data, r)

        terminated = np.zeros(num_envs, bool)
        played = np.zeros(num_envs, np.int32)
        mpjpes = np.zeros((max_len, num_envs), np.float32)
        preds = np.zeros((max_len, num_envs, 24, 3), np.float32)
        gts = np.zeros((max_len, num_envs, 24, 3), np.float32)

        for t in range(max_len):
            actions = act_fn(obs)
            state, out = step_j(data, state, actions)
            obs = out.obs
            term = np.asarray(out.terminated)
            # terminations after the motion's last frame don't count (train.py:110-112)
            in_motion = t < motion_steps
            terminated |= term & in_motion
            played += (~terminated) & in_motion
            mpjpes[t] = np.asarray(out.mpjpe)
            frame = jax.jit(lambda p: forward_kinematics(env.model, p))(state.physics)
            preds[t] = np.asarray(frame.pos)
            # ground truth at this time
            from phc_tpu.motionlib import get_motion_state

            times = jnp.minimum(
                (jnp.asarray(t + 1, jnp.float32)) * env.control_dt, data.motion_lengths
            )
            ref = get_motion_state(data, jnp.arange(num_envs, dtype=jnp.int32), times)
            gts[t] = np.asarray(ref.rg_pos)
            if bool(terminated.all()):
                break

        terminate_hist.append(terminated[:real])
        played_steps_all.append(played[:real])
        motion_len_all.append(motion_steps[:real])
        for i in range(real):
            n = int(motion_steps[i]) - 1
            mpjpe_per_motion.append(mpjpes[: max(n, 1), i].mean())
            pred_pos_all.append(preds[: max(n, 1), i])
            gt_pos_all.append(gts[: max(n, 1), i])

        start += real
        batch_i += 1
        if verbose:
            succ = 1 - np.concatenate(terminate_hist).mean()
            print(
                f"[eval] batch {batch_i}: motions {start}/{num_unique} "
                f"success so far {succ:.3f}",
                flush=True,
            )

    lib.im_eval = was_eval

    terminate_hist = np.concatenate(terminate_hist)[:num_unique]
    success_rate = 1.0 - terminate_hist.mean()
    # map back to the original (unsorted) key order
    keys_sorted = lib.motion_keys[order[:num_unique]]
    failed_keys = keys_sorted[terminate_hist].tolist()

    succ_idx = np.flatnonzero(~terminate_hist).tolist()
    metrics_all = compute_metrics_lite(pred_pos_all, gt_pos_all)
    metrics_succ = compute_metrics_lite(
        [pred_pos_all[i] for i in succ_idx], [gt_pos_all[i] for i in succ_idx]
    )
    if not metrics_succ:
        metrics_succ = metrics_all

    results = {
        "eval/success_rate": float(success_rate),
        "eval/mpjpe_all": float(np.mean(metrics_all["mpjpe_g"])),
        "eval/mpjpe_succ": float(np.mean(metrics_succ["mpjpe_g"])),
        "eval/accel_dist": float(np.mean(metrics_succ["accel_dist"])),
        "eval/vel_dist": float(np.mean(metrics_succ["vel_dist"])),
        "eval/mpjpel_all": float(np.mean(metrics_all["mpjpe_l"])),
        "eval/mpjpel_succ": float(np.mean(metrics_succ["mpjpe_l"])),
        "eval/mpjpe_pa": float(np.mean(metrics_succ["mpjpe_pa"])),
    }
    by_motion = {
        "motion_keys": keys_sorted.tolist(),
        "motion_length": np.concatenate(motion_len_all)[:num_unique],
        "played_steps": np.concatenate(played_steps_all)[:num_unique],
        "success": ~terminate_hist,
        "mpjpe": np.asarray(mpjpe_per_motion[:num_unique]),
    }
    return results, by_motion, failed_keys
