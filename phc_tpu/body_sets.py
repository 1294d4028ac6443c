"""Body-part index sets for the SMPL humanoid.

Same capability as the reference's `puffer_phc/body_sets.py:11-158`: named
subsets of the 24 bodies used for tracking, AMP key bodies, contact checks,
early termination, and evaluation, plus helpers to build index arrays.
"""

from __future__ import annotations

import numpy as np

from phc_tpu.assets.smpl_humanoid import body_names

BODY_NAMES = body_names()
DOF_NAMES = BODY_NAMES[1:]

# Bodies with unreliable mocap data, excluded from AMP dofs and eval metrics
REMOVE_NAMES = ("L_Hand", "R_Hand", "L_Toe", "R_Toe")

# AMP key bodies (end effectors)
KEY_BODIES = ("R_Ankle", "L_Ankle", "R_Wrist", "L_Wrist")

# Ground-contact bodies
CONTACT_BODIES = ("R_Ankle", "L_Ankle", "R_Toe", "L_Toe")

TRACK_BODIES = BODY_NAMES
RESET_BODIES = TRACK_BODIES
EVAL_BODIES = tuple(n for n in BODY_NAMES if n not in REMOVE_NAMES)

JOINT_GROUPS = (
    ("L_Hip", "L_Knee", "L_Ankle", "L_Toe"),
    ("R_Hip", "R_Knee", "R_Ankle", "R_Toe"),
    ("Pelvis", "Torso", "Spine", "Chest", "Neck", "Head"),
    ("L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand"),
    ("R_Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand"),
)

LIMB_WEIGHT_GROUP = tuple(tuple(BODY_NAMES.index(n) for n in g) for g in JOINT_GROUPS)


def body_ids(target_names) -> np.ndarray:
    """Indices of `target_names` within BODY_NAMES (reference :143-158)."""
    return np.asarray([BODY_NAMES.index(n) for n in target_names], dtype=np.int32)


def dof_subset_indices() -> np.ndarray:
    """Dof indices excluding REMOVE_NAMES joints (reference
    `humanoid_phc.py:186-194`): 19 joints x 3 = 57 of the 69 dofs."""
    keep = []
    for i, name in enumerate(DOF_NAMES):
        if name not in REMOVE_NAMES:
            keep.extend(range(3 * i, 3 * i + 3))
    return np.asarray(keep, dtype=np.int32)


def freeze_dof_indices() -> np.ndarray:
    """Dofs whose PD targets are frozen to 0 (hands + toes, reference
    `humanoid_phc.py:116-125` with freeze_hand/freeze_toe defaults True)."""
    frozen = []
    for name in ("L_Hand", "R_Hand", "L_Toe", "R_Toe"):
        i = DOF_NAMES.index(name)
        frozen.extend(range(3 * i, 3 * i + 3))
    return np.asarray(sorted(frozen), dtype=np.int32)


def limb_weights(mass: np.ndarray, local_offsets: np.ndarray) -> np.ndarray:
    """Per-limb (length_sum, mass_sum) features, (10,) — reference
    `humanoid_phc.py:360-366`."""
    lengths = np.linalg.norm(local_offsets, axis=-1)
    out = [lengths[list(g)].sum() for g in LIMB_WEIGHT_GROUP]
    out += [mass[list(g)].sum() for g in LIMB_WEIGHT_GROUP]
    return np.asarray(out, dtype=np.float32)
