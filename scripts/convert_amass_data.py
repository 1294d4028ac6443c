"""Offline AMASS .npz -> training .pkl converter.

Value-parity port of the reference converter
(`/root/reference/scripts/convert_amass_data.py`): filters/bound-crops
occluded sequences (:113-122), resamples to 30 fps via frame skipping
(:138-139), selects the first 22 SMPL joints + dummy hands (:24,143-145),
reorders SMPL joints to the MuJoCo humanoid order and composes local
axis-angles down the MuJoCo-order tree (:157-166), adds the pelvis offset to
the root translation (:150), applies the upright-start correction by
right-multiplying every global rotation by `inv([0.5,0.5,0.5,0.5])`
(:168-181), and dumps {key: {root_trans_offset, pose_aa, pose_quat_global,
beta, gender, fps}} clips — the schema the motion library consumes (same as
the shipped `sample_data/cmu_mocap_05_06.pkl`).

The reference leans on `smpl_sim`/poselib for the SMPL body model; this
version needs only the shipped asset tables plus numpy/scipy. The parity is
tested value-level in tests/test_runtime.py: re-running the pose pipeline on
the sample clip's stored `pose_aa` reproduces its `pose_quat_global`.

Usage:
  python scripts/convert_amass_data.py --amass-root <dir> --out amass_train.pkl \
      [--upright-start true] [--occlusion-file amass_occlusion_v3.pkl]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import glob
import os

import joblib
import numpy as np
from scipy.spatial.transform import Rotation as sRot

# SMPL joint order (24 joints, as in AMASS poses[:, :72])
SMPL_JOINT_NAMES = [
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck", "L_Thorax",
    "R_Thorax", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist", "L_Hand", "R_Hand",
]

# MuJoCo humanoid body order (the asset tables / reference body_sets.py)
from phc_tpu.body_sets import BODY_NAMES as MUJOCO_NAMES  # noqa: E402
from phc_tpu.assets import smpl_humanoid as H  # noqa: E402

SMPL2MUJOCO = [SMPL_JOINT_NAMES.index(n) for n in MUJOCO_NAMES]
MUJOCO_PARENTS = H.parent_indices()
PELVIS_OFFSET = np.asarray(H.local_offsets()[0], np.float64)  # tree.local_translation[0]

# 22 real SMPL joints; the finger dofs are replaced by zeroed dummy hands
# (reference SELECT_DOF, :24)
SELECT_DOF = 22 * 3


def mujoco_global_rotations(pose_aa_mj: np.ndarray) -> np.ndarray:
    """Compose per-joint axis-angle locals down the MuJoCo-order tree.

    pose_aa_mj: (F, 24, 3) in MuJoCo body order. Returns (F, 24, 4) xyzw
    global rotations — exactly the reference's SkeletonState
    `global_rotation` (only parent relationships matter, reference :161-166).
    """
    F = pose_aa_mj.shape[0]
    local = sRot.from_rotvec(pose_aa_mj.reshape(-1, 3)).as_quat().reshape(F, 24, 4)
    glob = np.zeros_like(local)
    for j, p in enumerate(MUJOCO_PARENTS):
        if p < 0:
            glob[:, j] = local[:, j]
        else:
            glob[:, j] = (sRot.from_quat(glob[:, p]) * sRot.from_quat(local[:, j])).as_quat()
    return glob


def pose_aa_to_quat_global(pose_aa: np.ndarray, upright_start: bool = True) -> np.ndarray:
    """(F, 72) SMPL-order axis angles -> (F, 24, 4) MuJoCo-order global quats
    with the upright correction applied (reference :157-181)."""
    F = pose_aa.shape[0]
    pose_aa_mj = pose_aa.reshape(F, 24, 3)[:, SMPL2MUJOCO]
    glob = mujoco_global_rotations(pose_aa_mj)
    if upright_start:
        # right-multiply EVERY global rotation by inv([.5,.5,.5,.5]) — the
        # reference's upright-start re-basing (:168-175); root translation is
        # unchanged by this
        corr = sRot.from_quat([0.5, 0.5, 0.5, 0.5]).inv()
        glob = (sRot.from_quat(glob.reshape(-1, 4)) * corr).as_quat().reshape(F, 24, 4)
    return glob


def convert_sequence(
    npz_path: str, upright_start: bool = True, target_fps: int = 30, bound: int = 0
):
    entry = np.load(npz_path, allow_pickle=True)
    if "mocap_framerate" in entry:
        fps = float(entry["mocap_framerate"])
    elif "mocap_frame_rate" in entry:
        fps = float(entry["mocap_frame_rate"])
    else:
        return None
    if "poses" not in entry:
        return None

    # 30 fps resample by frame skip (reference :138-139 uses int(), not round)
    skip = max(int(fps / target_fps), 1)
    trans = np.asarray(entry["trans"])[::skip]
    # first 22 joints + zeroed dummy hands (reference :143-145)
    poses = np.asarray(entry["poses"])[::skip, :SELECT_DOF]
    pose_aa = np.concatenate([poses, np.zeros((trans.shape[0], 6))], axis=-1)

    # occlusion bound-crop (reference :147-152)
    num_frames = pose_aa.shape[0]
    if bound == 0:
        bound = num_frames
    trans = trans[:bound]
    pose_aa = pose_aa[:bound]
    if pose_aa.shape[0] < 10:
        return None

    # pelvis offset folded into the stored root translation (reference :150)
    root_trans_offset = trans.astype(np.float64) + PELVIS_OFFSET

    pose_quat_global = pose_aa_to_quat_global(pose_aa, upright_start=upright_start)

    betas = np.asarray(entry.get("betas", np.zeros(16)))[:16]
    gender = str(entry.get("gender", "neutral"))
    return {
        "root_trans_offset": root_trans_offset,
        "pose_aa": pose_aa.astype(np.float64),
        "pose_quat_global": pose_quat_global.astype(np.float64),
        "beta": betas.astype(np.float64),
        "gender": gender,
        "fps": target_fps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amass-root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--upright-start", default="true")
    ap.add_argument(
        "--occlusion-file",
        default=None,
        help="PHC amass_occlusion_v3 pkl: {key: {issue, idxes}} (reference :113-122)",
    )
    ap.add_argument(
        "--name-offset", type=int, default=-3, help="path components forming the key"
    )
    args = ap.parse_args()

    upright = args.upright_start.lower() in ("1", "true", "yes")
    occlusion = {}
    if args.occlusion_file and os.path.exists(args.occlusion_file):
        occlusion = joblib.load(args.occlusion_file)

    out = {}
    files = sorted(glob.glob(os.path.join(args.amass_root, "**", "*.npz"), recursive=True))
    print(f"found {len(files)} sequences")
    for i, f in enumerate(files):
        splits = f.split(os.sep)[args.name_offset :]
        key = "0-" + "_".join(splits).replace(".npz", "")

        # occlusion handling with idxes bound-crop (reference :113-122)
        bound = 0
        if key in occlusion:
            issue = occlusion[key].get("issue")
            if issue in ("sitting", "airborne") and "idxes" in occlusion[key]:
                bound = int(occlusion[key]["idxes"][0])  # assumes 30 fps
                if bound < 10:
                    print(f"bound too small {key} {bound}")
                    continue
            else:
                print(f"issue irrecoverable {key} {issue}")
                continue
        if key == "0-KIT_442_PizzaDelivery02_poses":  # reference :135-136
            bound = -2

        try:
            clip = convert_sequence(f, upright_start=upright, bound=bound)
        except Exception as e:  # malformed npz
            print(f"skip {f}: {e}")
            continue
        if clip is not None:
            out[key] = clip
        if (i + 1) % 200 == 0:
            print(f"converted {i + 1}/{len(files)} ({len(out)} kept)")

    joblib.dump(out, args.out)
    print(f"wrote {len(out)} clips to {args.out}")


if __name__ == "__main__":
    main()
