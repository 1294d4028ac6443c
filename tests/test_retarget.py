"""Retargeting tests (reference poselib `retarget_to`,
`poselib_skeleton.py:871-1073`)."""

import joblib
import numpy as np

from phc_tpu.assets import smpl_humanoid as H
from phc_tpu.kinematics import forward_kinematics_np, global_to_local_rotations_np
from phc_tpu.retarget import retarget_clip_to_scaled_skeleton, retarget_motion

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"


def _load_clip():
    clip = next(iter(joblib.load(SAMPLE_PKL).values()))
    return (
        np.asarray(clip["pose_quat_global"], np.float32)[:40],
        np.asarray(clip["root_trans_offset"], np.float32)[:40],
    )


def test_retarget_to_scaled_skeleton():
    """Identity-mapping retarget onto a uniformly scaled skeleton: global
    rotations are preserved and root-relative body positions scale by the
    factor (bounded FK error)."""
    tree = H.skeleton_tree()
    grot, root_t = _load_clip()
    scale = 1.25

    out = retarget_clip_to_scaled_skeleton(tree, grot, root_t, scale)

    # rotations preserved (identity tpose, identity mapping)
    dots = np.abs(np.sum(out["global_rotation"] * grot, axis=-1))
    assert dots.min() > 1.0 - 1e-4, dots.min()

    # root-relative positions scale
    local_src = global_to_local_rotations_np(tree, grot)
    _, gpos_src = forward_kinematics_np(tree, local_src, root_t)
    rel_src = gpos_src - gpos_src[:, :1]
    rel_tgt = out["global_translation"] - out["global_translation"][:, :1]
    err = np.abs(rel_tgt - scale * rel_src).max()
    assert err < 1e-3, err

    # feet grounded: global minimum z touches 0
    assert abs(out["global_translation"][..., 2].min()) < 1e-4


def test_retarget_with_dropped_joints():
    """Partial joint mapping: hands/toes unmapped — they must inherit the
    nearest mapped ancestor's rotation and the retarget still produces a
    full target-skeleton motion."""
    tree = H.skeleton_tree()
    grot, root_t = _load_clip()

    drop = {"L_Hand", "R_Hand", "L_Toe", "R_Toe"}
    mapping = {n: n for n in tree.node_names if n not in drop}

    tpose = np.zeros((len(tree), 4), np.float32)
    tpose[:, 3] = 1.0
    local = global_to_local_rotations_np(tree, grot)

    out = retarget_motion(
        source_tree=tree,
        source_local_rot=local,
        source_root_trans=root_t,
        joint_mapping=mapping,
        source_tpose_local_rot=tpose,
        source_tpose_root_trans=np.zeros(3, np.float32),
        target_tree=tree,
        target_tpose_local_rot=tpose,
        target_tpose_root_trans=np.zeros(3, np.float32),
        ground_feet=False,
    )
    assert out["local_rotation"].shape == grot.shape
    # unmapped joints carry their parent's global rotation
    for child, parent in (("L_Hand", "L_Wrist"), ("R_Toe", "R_Ankle")):
        ci, pi = tree.index(child), tree.index(parent)
        d = np.abs(np.sum(out["global_rotation"][:, ci] * out["global_rotation"][:, pi], -1))
        assert d.min() > 1.0 - 1e-5
    # mapped joints keep their rotations
    mapped_ids = [tree.index(n) for n in mapping]
    d = np.abs(np.sum(out["global_rotation"][:, mapped_ids] * grot[:, mapped_ids], -1))
    assert d.min() > 1.0 - 1e-4


def test_retarget_with_frame_rotation():
    """rotation_to_target re-bases the motion into the target frame. With
    identity T-poses the reference's algebra gives g_new = r * g * inv(r)
    (the relative-to-tpose rotation is conjugated into the target frame,
    poselib_skeleton.py:966-1003) and the root trajectory rotates by r."""
    from phc_tpu.kinematics import _np_quat_conj, _np_quat_mul, _np_quat_normalize, _np_quat_rotate

    tree = H.skeleton_tree()
    grot, root_t = _load_clip()
    tpose = np.zeros((len(tree), 4), np.float32)
    tpose[:, 3] = 1.0
    local = global_to_local_rotations_np(tree, grot)
    yaw90 = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)

    out = retarget_motion(
        source_tree=tree,
        source_local_rot=local,
        source_root_trans=root_t,
        joint_mapping={n: n for n in tree.node_names},
        source_tpose_local_rot=tpose,
        source_tpose_root_trans=np.zeros(3, np.float32),
        target_tree=tree,
        target_tpose_local_rot=tpose,
        target_tpose_root_trans=np.zeros(3, np.float32),
        rotation_to_target=yaw90,
        ground_feet=False,
    )
    # root trajectory rotates by yaw90: (x, y) -> (-y, x)
    expect_root = np.stack([-root_t[:, 1], root_t[:, 0], root_t[:, 2]], axis=-1)
    assert np.abs(out["root_translation"] - expect_root).max() < 1e-3

    # global rotations are conjugated: r * g * inv(r)
    r = np.broadcast_to(yaw90, grot.shape)
    expect_rot = _np_quat_normalize(_np_quat_mul(_np_quat_mul(r, grot), _np_quat_conj(r)))
    dots = np.abs(np.sum(out["global_rotation"] * expect_rot, axis=-1))
    assert dots.min() > 1.0 - 1e-4, dots.min()
