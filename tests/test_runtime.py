"""Runtime-layer tests: eval harness, orbax checkpoint roundtrip, AMASS
converter (synthetic npz), metrics.

Covers the surfaces SURVEY.md §3.4/§5.4 map from the reference
(`scripts/train.py:75-257` EvalStats, `clean_pufferl/utils.py:18-56`
checkpoints, `scripts/convert_amass_data.py`).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phc_tpu.config import EnvConfig
from phc_tpu.motionlib import MotionLib

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
STEP_DT = 1.0 / 30.0


def test_eval_harness_random_policy():
    """evaluate_policy sweeps the corpus and produces the reference's
    eval/* metric keys; a random policy should (almost surely) fail the
    clip, exercising the termination bookkeeping."""
    from phc_tpu.runtime.eval_harness import evaluate_policy

    cfg = EnvConfig(num_envs=4, motion_file=SAMPLE_PKL)
    lib = MotionLib(SAMPLE_PKL, is_deterministic=True, step_dt=STEP_DT, seed=0)

    rng = np.random.default_rng(0)

    def act_fn(obs, carry):
        return jnp.asarray(rng.uniform(-1, 1, (obs.shape[0], 69)).astype(np.float32)), carry

    results, per_motion, failed = evaluate_policy(
        cfg, lib, act_fn, num_envs=4, max_steps_cap=40, verbose=False
    )
    for key in (
        "eval/success_rate",
        "eval/mpjpe_all",
        "eval/mpjpel_all",
        "eval/mpjpe_pa",
        "eval/accel_dist",
        "eval/vel_dist",
    ):
        assert key in results, results.keys()
    assert 0.0 <= results["eval/success_rate"] <= 1.0
    assert np.isfinite(results["eval/mpjpe_all"])
    # the single-clip corpus: per-motion arrays have one entry
    assert len(per_motion["success"]) == lib.num_unique_motions
    # failed keys feed PMCP (update_hard_sampling_weight accepts them)
    lib.update_hard_sampling_weight(failed)


def _make_multiclip_corpus(tmp_path, n_clips=7):
    """Derive a small multi-clip corpus from the shipped sample: varying-
    length crops with distinct keys (the shape of a real AMASS corpus —
    different lengths force the eval batch planner to do real work)."""
    import joblib

    src = next(iter(joblib.load(SAMPLE_PKL).values()))
    F = len(src["pose_quat_global"])
    corpus = {}
    rng = np.random.default_rng(0)
    for i in range(n_clips):
        n = int(rng.integers(40, F))
        s = int(rng.integers(0, F - n))
        corpus[f"0-derived_clip_{i:02d}"] = {
            "root_trans_offset": np.asarray(src["root_trans_offset"])[s : s + n],
            "pose_aa": np.asarray(src["pose_aa"])[s : s + n],
            "pose_quat_global": np.asarray(src["pose_quat_global"])[s : s + n],
            "beta": src["beta"],
            "gender": src["gender"],
            "fps": src["fps"],
        }
    path = tmp_path / "multiclip.pkl"
    joblib.dump(corpus, path)
    return str(path)


def test_eval_harness_multiclip_corpus(tmp_path):
    """Corpus-scale eval protocol (r1 VERDICT item 3 'done' criterion): more
    motions than envs -> multiple longest-first batches, one shared packed
    capacity (no capacity ValueError, one compile per shape), per-motion
    results for every clip, TSV persisted."""
    from phc_tpu.runtime.eval_harness import evaluate_policy, plan_eval_capacity, write_by_motion_tsv

    path = _make_multiclip_corpus(tmp_path, n_clips=7)
    cfg = EnvConfig(num_envs=3, motion_file=path)
    # training-shaped loader: random 60-frame crops, capacity from train load
    lib = MotionLib(path, max_length=60, is_deterministic=False, step_dt=STEP_DT, seed=0)
    data = lib.load_motions(num_motions=3)
    lib.frame_capacity = int(data.gts.shape[0] * 1.25) + 1  # the train sizing

    order, cap = plan_eval_capacity(lib, num_envs=3, eval_max_len=600)
    assert cap > lib.frame_capacity, "corpus eval must exceed the train capacity"

    rng = np.random.default_rng(0)

    def act_fn(obs, carry):
        return np.zeros((obs.shape[0], 69), np.float32), carry

    # 7 motions through 3 envs -> 3 batches; must not raise despite the small
    # train capacity (eval plans its own), and must produce all 7 rows
    results, per_motion, failed = evaluate_policy(
        cfg, lib, act_fn, num_envs=3, max_steps_cap=30, verbose=False
    )
    assert len(per_motion["success"]) == 7
    assert len(per_motion["motion_keys"]) == 7
    assert set(failed).issubset(set(per_motion["motion_keys"]))
    # eval loads are deterministic full-length (<=600) crops, NOT the train
    # loader's random 60-frame windows
    assert int(np.asarray(per_motion["motion_length"]).max()) <= 600

    tsv = tmp_path / "by_motion.tsv"
    write_by_motion_tsv(tsv, per_motion)
    lines = tsv.read_text().strip().splitlines()
    assert len(lines) == 8  # header + 7 motions


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint -> latest_checkpoint -> load_checkpoint restores the
    exact train-state pytree (params, opt state, norm stats, rng, counters)."""
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.rl import ppo as ppo_mod
    from phc_tpu.config import TrainConfig, PolicyConfig
    from phc_tpu.runtime import checkpoint as ck

    cfg = EnvConfig(num_envs=4, motion_file=SAMPLE_PKL)
    env = henv.make_env(cfg)
    ppo = ppo_mod.make_ppo(
        TrainConfig(batch_size=16, minibatch_size=8), env, PolicyConfig(hidden_size=16, layer_sizes=(32, 16))
    )
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))

    path = ck.save_checkpoint(str(tmp_path), "exp1", 7, state, {"a": 1})
    assert Path(path).exists()
    assert ck.latest_checkpoint(str(tmp_path), "exp1") == path
    restored = ck.load_checkpoint(path, state)

    leaves0 = jax.tree_util.tree_leaves(state)
    leaves1 = jax.tree_util.tree_leaves(restored)
    assert len(leaves0) == len(leaves1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg_json = json.loads((tmp_path / "exp1" / "config.json").read_text())
    assert cfg_json == {"a": 1}


def test_streaming_pa_mpjpe_matches_numpy_procrustes():
    """The device-side Newton-polar PA alignment must reproduce the numpy
    SVD-based _procrustes_align to float tolerance."""
    from phc_tpu.runtime.eval_harness import _pa_mpjpe
    from phc_tpu.runtime.metrics import _procrustes_align

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(16, 24, 3)).astype(np.float32)
    # pred = rotated+scaled+shifted gt + noise (realistic near-rigid case)
    th = 0.4
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32
    )
    pred = 1.1 * gt @ R.T + 0.3 + 0.05 * rng.normal(size=gt.shape).astype(np.float32)

    dev = np.asarray(_pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    ref_aligned = _procrustes_align(pred.astype(np.float64), gt.astype(np.float64))
    ref = np.linalg.norm(ref_aligned - gt, axis=-1).mean(axis=-1)
    np.testing.assert_allclose(dev, ref, rtol=1e-3, atol=1e-5)


def test_checkpoint_topology_portability(tmp_path):
    """Checkpoints are topology-free (SURVEY §5.3/§5.4 multi-host
    coherence): a state saved under an 8-device replicated placement
    restores bit-exactly on a single device, and a single-device checkpoint
    restores onto the 8-device mesh — the restore target's placement is
    independent of the save-time mesh (orbax stores the logical array)."""
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.parallel import make_mesh
    from phc_tpu.rl import ppo as ppo_mod
    from phc_tpu.config import TrainConfig, PolicyConfig
    from phc_tpu.runtime import checkpoint as ck

    cfg = EnvConfig(num_envs=4, motion_file=SAMPLE_PKL)
    env = henv.make_env(cfg)
    ppo = ppo_mod.make_ppo(
        TrainConfig(batch_size=16, minibatch_size=8),
        env,
        PolicyConfig(hidden_size=16, layer_sizes=(32, 16)),
    )
    state = ppo_mod.init_state(ppo, jax.random.PRNGKey(0))
    mesh = make_mesh(data_axis=8, model_axis=1)

    def assert_equal(a_tree, b_tree):
        for a, b in zip(jax.tree_util.tree_leaves(a_tree), jax.tree_util.tree_leaves(b_tree)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 8-device replicated save -> single-device restore
    state_repl = mesh.replicate(state)
    p8 = ck.save_checkpoint(str(tmp_path), "dp8", 1, state_repl, {})
    restored_1 = ck.load_checkpoint(p8, state)
    assert_equal(state, restored_1)

    # single-device save -> restore then place on the 8-device mesh
    p1 = ck.save_checkpoint(str(tmp_path), "dp1", 1, state, {})
    restored_8 = mesh.replicate(ck.load_checkpoint(p1, state))
    assert_equal(state, restored_8)
    leaf = jax.tree_util.tree_leaves(restored_8.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_amass_converter_synthetic(tmp_path):
    """convert_amass_data on a synthetic AMASS-format npz: output schema
    matches the shipped sample pkl and loads through MotionLib."""
    import joblib

    rng = np.random.default_rng(1)
    F = 120
    npz = tmp_path / "amass" / "SubjA" / "seq1_poses.npz"
    npz.parent.mkdir(parents=True)
    np.savez(
        npz,
        poses=np.concatenate(
            [0.2 * rng.normal(size=(F, 66)), np.zeros((F, 90))], axis=1
        ).astype(np.float64),
        trans=np.cumsum(0.01 * rng.normal(size=(F, 3)), axis=0).astype(np.float64),
        betas=np.zeros(16),
        gender="neutral",
        mocap_framerate=np.float64(60.0),
    )

    out = tmp_path / "out.pkl"
    proc = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "scripts" / "convert_amass_data.py"),
            "--amass-root",
            str(tmp_path / "amass"),
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    clips = joblib.load(out)
    assert len(clips) == 1
    clip = next(iter(clips.values()))
    for key in ("root_trans_offset", "pose_aa", "pose_quat_global", "beta", "gender", "fps"):
        assert key in clip, clip.keys()
    assert clip["fps"] == 30
    assert clip["pose_aa"].shape[1:] == (72,)  # flat, like the shipped sample
    assert clip["pose_quat_global"].shape[1:] == (24, 4)
    # 60 -> 30 fps halves the frame count
    assert abs(clip["pose_aa"].shape[0] - F // 2) <= 2

    lib = MotionLib(str(out), is_deterministic=True, step_dt=STEP_DT)
    data = lib.load_motions(num_motions=2)
    assert data.gts.ndim == 3


def test_amass_converter_golden_values():
    """Value-level parity with the reference converter: re-running the pose
    pipeline (SMPL->MuJoCo reorder, tree composition, upright right-multiply
    by inv([.5,.5,.5,.5]) — reference convert_amass_data.py:157-181) on the
    shipped sample clip's stored `pose_aa` must reproduce its
    `pose_quat_global` exactly (up to quaternion sign)."""
    import joblib

    from scripts.convert_amass_data import PELVIS_OFFSET, pose_aa_to_quat_global

    clips = joblib.load(SAMPLE_PKL)
    clip = next(iter(clips.values()))
    pose_aa = np.asarray(clip["pose_aa"])
    want = np.asarray(clip["pose_quat_global"])

    got = pose_aa_to_quat_global(pose_aa, upright_start=True)
    dots = np.abs(np.sum(got * want, axis=-1))  # 1.0 iff equal up to sign
    assert dots.min() > 1.0 - 1e-10, dots.min()

    # the pelvis offset the reference folds into root_trans_offset (:150)
    # comes from the asset tree's root local translation
    assert PELVIS_OFFSET.shape == (3,)
    assert abs(PELVIS_OFFSET[1] - (-0.2233)) < 1e-6
