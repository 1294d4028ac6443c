"""Skeleton retargeting: map a motion from a source skeleton to a target.

Host-side numpy port of reference poselib's `SkeletonState.retarget_to` /
`retarget_to_by_tpose` (`/root/reference/puffer_phc/poselib_skeleton.py:
871-1073`). Retargeting is offline data preparation (it runs once per
dataset, like the AMASS converter), so it lives on the host next to the
motion loader rather than in the jitted compute path.

Algorithm (the reference's steps, :884-903):
  1. keep only source joints present in the joint mapping (dropped joints'
     offsets fold into their children — `SkeletonTree.keep_nodes`);
  2. rotate the source state and source T-pose by `rotation_to_target` so
     the source frame aligns with the target frame;
  3. scale the root translation delta (state minus T-pose) into target units;
  4. express each mapped joint's global rotation RELATIVE to the source
     T-pose and re-apply that relative rotation to the target T-pose:
         g_new = (g_state * inv(g_tpose_src)) * g_tpose_tgt
  5. unmapped target joints inherit the nearest mapped ancestor's global
     rotation; root translation = target T-pose root + scaled delta;
  6. convert the composed global rotations back to target local rotations.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from phc_tpu.kinematics import (
    SkeletonTree,
    forward_kinematics_np,
    global_to_local_rotations_np,
    _np_quat_conj,
    _np_quat_mul,
    _np_quat_normalize,
    _np_quat_rotate,
)


def _tpose_globals(tree: SkeletonTree, local_rot: np.ndarray, root_t: np.ndarray):
    grot, gpos = forward_kinematics_np(
        tree, local_rot[None].astype(np.float32), root_t[None].astype(np.float32)
    )
    return grot[0], gpos[0]


def retarget_motion(
    source_tree: SkeletonTree,
    source_local_rot: np.ndarray,  # (F, Js, 4) xyzw
    source_root_trans: np.ndarray,  # (F, 3)
    joint_mapping: Dict[str, str],  # source name -> target name
    source_tpose_local_rot: np.ndarray,  # (Js, 4)
    source_tpose_root_trans: np.ndarray,  # (3,)
    target_tree: SkeletonTree,
    target_tpose_local_rot: np.ndarray,  # (Jt, 4)
    target_tpose_root_trans: np.ndarray,  # (3,)
    rotation_to_target: np.ndarray = np.array([0.0, 0.0, 0.0, 1.0]),  # (4,) xyzw
    scale_to_target: float = 1.0,
    ground_feet: bool = True,
) -> dict:
    """Retarget a motion to `target_tree`.

    Returns {"local_rotation": (F, Jt, 4), "root_translation": (F, 3),
    "global_rotation": (F, Jt, 4), "global_translation": (F, Jt, 3)}.

    ground_feet re-grounds the output so the minimum global z over the
    motion touches z=0 (reference step 6, `retarget_to_by_tpose` keeps feet
    on the floor).
    """
    F = source_local_rot.shape[0]

    # ---- step 1: restrict the source to the mapped joints -----------------
    keep = [n for n in source_tree.node_names if n in joint_mapping]
    assert keep and keep[0] == source_tree.node_names[0], (
        "joint_mapping must include the source root"
    )
    sub_tree = source_tree.keep_nodes(keep)
    keep_ids = np.array([source_tree.index(n) for n in sub_tree.node_names])

    # NOTE on dropped-joint offsets: the reference folds *pairwise average
    # translations measured from the motion* (:957-961); for rigid skeletons
    # the static chain-sum used by keep_nodes is the same quantity expressed
    # in the parent frame, which FK then rotates per pose. Locals of kept
    # joints change when parents drop, so we work from globals (exact for
    # any drop pattern):
    g_src, _ = forward_kinematics_np(
        source_tree, source_local_rot.astype(np.float32), source_root_trans.astype(np.float32)
    )
    g_src = g_src[:, keep_ids]  # (F, K, 4) kept joints' global rotations
    g_tpose_src_full, _ = _tpose_globals(
        source_tree, source_tpose_local_rot, source_tpose_root_trans
    )
    g_tpose_src = g_tpose_src_full[keep_ids]

    # ---- step 2: rotate source into the target frame ----------------------
    r2t = _np_quat_normalize(np.asarray(rotation_to_target, np.float64))[None]
    g_src = _np_quat_normalize(_np_quat_mul(np.broadcast_to(r2t, g_src.shape), g_src))
    g_tpose_src = _np_quat_normalize(
        _np_quat_mul(np.broadcast_to(r2t, g_tpose_src.shape), g_tpose_src)
    )
    root_t = _np_quat_rotate(r2t, source_root_trans)
    tpose_root_t = _np_quat_rotate(r2t, source_tpose_root_trans[None])[0]

    # ---- step 3: scale the root translation delta -------------------------
    root_delta = (root_t - tpose_root_t[None]) * scale_to_target

    # ---- step 4: relative rotation re-applied to the target T-pose --------
    g_tpose_tgt, _ = _tpose_globals(target_tree, target_tpose_local_rot, target_tpose_root_trans)

    rel = _np_quat_normalize(_np_quat_mul(g_src, _np_quat_conj(g_tpose_src[None])))

    # ---- step 5: compose per-target-joint globals --------------------------
    tgt_names = list(target_tree.node_names)
    src_of_tgt = {v: k for k, v in joint_mapping.items()}
    sub_names = list(sub_tree.node_names)

    g_new = np.zeros((F, len(tgt_names), 4), np.float64)
    for ti, tname in enumerate(tgt_names):
        # nearest mapped ancestor (reference :1005-1011)
        name = tname
        while name not in src_of_tgt or src_of_tgt[name] not in sub_names:
            p = int(target_tree.parent_indices[target_tree.index(name)])
            assert p >= 0, f"target root {tname} has no mapped ancestor"
            name = target_tree.node_names[p]
        si = sub_names.index(src_of_tgt[name])
        g_new[:, ti] = _np_quat_normalize(
            _np_quat_mul(rel[:, si], np.broadcast_to(g_tpose_tgt[ti][None], (F, 4)))
        )

    new_root_t = target_tpose_root_trans[None] + root_delta

    # ---- step 6: globals -> target locals, optional re-grounding ----------
    local = global_to_local_rotations_np(target_tree, g_new.astype(np.float32))
    grot, gpos = forward_kinematics_np(
        target_tree, local.astype(np.float32), new_root_t.astype(np.float32)
    )
    if ground_feet:
        zmin = gpos[..., 2].min()
        new_root_t = new_root_t - np.array([0.0, 0.0, zmin])
        gpos = gpos - np.array([0.0, 0.0, zmin], np.float32)

    return {
        "local_rotation": local,
        "root_translation": new_root_t.astype(np.float32),
        "global_rotation": grot,
        "global_translation": gpos,
    }


def retarget_clip_to_scaled_skeleton(
    tree: SkeletonTree,
    pose_quat_global: np.ndarray,  # (F, J, 4)
    root_trans: np.ndarray,  # (F, 3)
    scale: float,
    tpose_local_rot: Optional[np.ndarray] = None,
) -> dict:
    """Convenience wrapper: same topology, uniformly scaled bone lengths
    (the 'differently-sized human' case). Identity joint mapping."""
    scaled = SkeletonTree(
        node_names=tree.node_names,
        parent_indices=tree.parent_indices,
        local_translation=(tree.local_translation * scale).astype(np.float32),
    )
    if tpose_local_rot is None:
        tpose_local_rot = np.zeros((len(tree), 4), np.float32)
        tpose_local_rot[:, 3] = 1.0
    local = global_to_local_rotations_np(tree, pose_quat_global.astype(np.float32))
    mapping = {n: n for n in tree.node_names}
    tpose_root = np.zeros(3, np.float32)
    return retarget_motion(
        source_tree=tree,
        source_local_rot=local,
        source_root_trans=root_trans,
        joint_mapping=mapping,
        source_tpose_local_rot=tpose_local_rot,
        source_tpose_root_trans=tpose_root,
        target_tree=scaled,
        target_tpose_local_rot=tpose_local_rot,
        target_tpose_root_trans=tpose_root * scale,
        scale_to_target=scale,
    )
