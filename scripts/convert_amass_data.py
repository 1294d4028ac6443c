"""Offline AMASS .npz -> training .pkl converter.

Port of the reference converter (`/root/reference/scripts/convert_amass_data.py`):
filters occluded sequences, resamples to 30 fps, reorders SMPL joints to the
MuJoCo humanoid order, applies the upright-start correction, and dumps a
dict of {key: {root_trans_offset, pose_aa, pose_quat_global, beta, gender,
fps}} clips — the schema the motion library consumes (same as the shipped
`sample_data/cmu_mocap_05_06.pkl`).

The reference leans on `smpl_sim` for the SMPL body model; this version
needs only the joint tables below plus numpy/scipy. Global joint rotations
are obtained by composing axis-angle rotations down the SMPL kinematic tree
(for the MuJoCo-order skeleton the offsets come from the shipped asset
tables, so no SMPL model files are required).

Usage:
  python scripts/convert_amass_data.py --amass-root <dir> --out amass_train.pkl \
      [--upright-start true]
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
SMPL_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]

# MuJoCo humanoid body order (the asset tables / reference body_sets.py)
from phc_tpu.body_sets import BODY_NAMES as MUJOCO_NAMES  # noqa: E402

SMPL2MUJOCO = [SMPL_JOINT_NAMES.index(n) for n in MUJOCO_NAMES]


def smpl_global_rotations(pose_aa: np.ndarray) -> np.ndarray:
    """Compose per-joint axis-angle locals down the SMPL tree -> global quats.

    pose_aa: (F, 24, 3). Returns (F, 24, 4) xyzw in SMPL joint order.
    """
    F = pose_aa.shape[0]
    local = sRot.from_rotvec(pose_aa.reshape(-1, 3)).as_quat().reshape(F, 24, 4)
    glob = np.zeros_like(local)
    for j, p in enumerate(SMPL_PARENTS):
        if p < 0:
            glob[:, j] = local[:, j]
        else:
            glob[:, j] = (sRot.from_quat(glob[:, p]) * sRot.from_quat(local[:, j])).as_quat()
    return glob


def convert_sequence(npz_path: str, upright_start: bool = True, target_fps: int = 30):
    entry = np.load(npz_path, allow_pickle=True)
    if "mocap_framerate" in entry:
        fps = float(entry["mocap_framerate"])
    elif "mocap_frame_rate" in entry:
        fps = float(entry["mocap_frame_rate"])
    else:
        return None
    if "poses" not in entry:
        return None

    poses = np.asarray(entry["poses"])[:, :72]  # (F, 72)
    trans = np.asarray(entry["trans"])  # (F, 3)
    betas = np.asarray(entry.get("betas", np.zeros(16)))[:16]
    gender = str(entry.get("gender", "neutral"))

    # 30 fps resample (reference :138-139)
    skip = max(int(round(fps / target_fps)), 1)
    poses = poses[::skip]
    trans = trans[::skip]
    if len(poses) < 10:
        return None

    pose_aa = poses.reshape(-1, 24, 3)

    if upright_start:
        # rotate the whole motion so the default pose faces upright with
        # identity root (reference :168-181: -90deg about x folded into root)
        correction = sRot.from_euler("xyz", [-np.pi / 2, 0, 0])
        root = sRot.from_rotvec(pose_aa[:, 0])
        pose_aa[:, 0] = (correction.inv() * root).as_rotvec()
        trans = trans @ correction.inv().as_matrix().T

    glob_smpl = smpl_global_rotations(pose_aa)
    pose_quat_global = glob_smpl[:, SMPL2MUJOCO]

    return {
        "root_trans_offset": trans.astype(np.float64),
        "pose_aa": pose_aa.reshape(len(pose_aa), 72).astype(np.float64),
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
    ap.add_argument("--occlusion-file", default=None, help="pkl of keys to skip")
    args = ap.parse_args()

    upright = args.upright_start.lower() in ("1", "true", "yes")
    occluded = set()
    if args.occlusion_file and os.path.exists(args.occlusion_file):
        occluded = set(joblib.load(args.occlusion_file))

    out = {}
    files = sorted(glob.glob(os.path.join(args.amass_root, "**", "*.npz"), recursive=True))
    print(f"found {len(files)} sequences")
    for i, f in enumerate(files):
        key = "0-" + os.path.relpath(f, args.amass_root).replace(os.sep, "_").replace(".npz", "")
        if key in occluded:
            continue
        try:
            clip = convert_sequence(f, upright_start=upright)
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
