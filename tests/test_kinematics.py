"""Golden tests for skeleton FK against MuJoCo and the shipped AMASS sample.

The reference validates kinematics only visually (SURVEY.md §4); here FK is
checked exactly against MuJoCo's mj_kinematics on the same skeleton, and the
local<->global round trip is checked on real AMASS motion data.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from phc_tpu.assets import smpl_humanoid as H
from phc_tpu import kinematics as K
from phc_tpu import transforms as T

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"


def _load_sample():
    import joblib

    data = joblib.load(SAMPLE_PKL)
    entry = next(iter(data.values()))
    pose_quat_global = np.asarray(entry["pose_quat_global"], dtype=np.float32)  # (F, 24, 4) xyzw
    trans = np.asarray(entry["root_trans_offset"], dtype=np.float32)  # (F, 3)
    return pose_quat_global, trans


def test_tree_structure():
    tree = H.skeleton_tree()
    assert tree.num_joints == 24
    assert tree.node_names[0] == "Pelvis"
    assert int(tree.parent_indices[0]) == -1
    # levels partition all joints and respect parent ordering
    seen = np.concatenate([np.asarray(l) for l in tree.levels])
    assert sorted(seen.tolist()) == list(range(24))
    processed = set()
    for level in tree.levels:
        for j in np.asarray(level).tolist():
            p = int(tree.parent_indices[j])
            assert p == -1 or p in processed
        processed.update(np.asarray(level).tolist())


def test_global_local_roundtrip_on_amass_sample():
    tree = H.skeleton_tree()
    grot, trans = _load_sample()
    grot_j = jnp.asarray(grot)
    local = K.global_to_local_rotations(tree, grot_j)
    grot2, gpos = K.forward_kinematics(tree, local, jnp.asarray(trans))
    # rotations should round-trip exactly (up to sign)
    dot = np.abs(np.sum(np.asarray(grot2) * np.asarray(T.quat_normalize(grot_j)), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)
    # root position passes through
    np.testing.assert_allclose(np.asarray(gpos[:, 0]), trans, atol=1e-5)


@pytest.mark.parametrize("frame", [0, 50, 150])
def test_fk_matches_mujoco(frame):
    import mujoco

    tree = H.skeleton_tree()
    grot, trans = _load_sample()
    local = np.asarray(K.global_to_local_rotations(tree, jnp.asarray(grot)))

    m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball"))
    d = mujoco.MjData(m)

    # qpos: [root pos, root quat (wxyz), 23 ball quats (wxyz)]
    def to_wxyz(q):
        return np.concatenate([q[..., 3:4], q[..., :3]], axis=-1)

    qpos = np.zeros(m.nq)
    qpos[0:3] = trans[frame]
    qpos[3:7] = to_wxyz(local[frame, 0])
    for j in range(1, 24):
        qpos[7 + 4 * (j - 1) : 7 + 4 * j] = to_wxyz(local[frame, j])
    d.qpos[:] = qpos
    mujoco.mj_kinematics(m, d)

    grot2, gpos = K.forward_kinematics(tree, jnp.asarray(local[frame]), jnp.asarray(trans[frame]))

    # mujoco body 0 is world; our joint i corresponds to mujoco body i+1
    xpos = d.xpos[1:]
    xquat_wxyz = d.xquat[1:]
    xquat = np.concatenate([xquat_wxyz[:, 1:], xquat_wxyz[:, :1]], axis=-1)

    np.testing.assert_allclose(np.asarray(gpos), xpos, atol=2e-5)
    dot = np.abs(np.sum(np.asarray(grot2) * xquat, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_velocities_shapes_and_consistency():
    grot, trans = _load_sample()
    tree = H.skeleton_tree()
    local = np.asarray(K.global_to_local_rotations(tree, jnp.asarray(grot)))
    _, gpos = K.forward_kinematics(tree, jnp.asarray(local), jnp.asarray(trans))
    gpos = np.asarray(gpos)

    fps = 30.0
    vel = K.compute_linear_velocity(gpos, 1.0 / fps)
    avel = K.compute_angular_velocity(grot, 1.0 / fps)
    dof_vel = K.compute_dof_velocities(local, fps)

    F = grot.shape[0]
    assert vel.shape == (F, 24, 3)
    assert avel.shape == (F, 24, 3)
    assert dof_vel.shape == (F, 23, 3)

    # unsmoothed velocity should match the raw central difference
    vel_raw = K.compute_linear_velocity(gpos, 1.0 / fps, smooth=False)
    want = np.gradient(gpos, axis=0) * fps
    np.testing.assert_allclose(vel_raw, want, atol=1e-4)

    # angular velocity integrates forward approximately: q1 ~ dq(avel*dt) * q0
    avel_raw = K.compute_angular_velocity(grot, 1.0 / fps, smooth=False)
    i = 60
    dq = T.quat_from_angle_axis(
        jnp.asarray(np.linalg.norm(avel_raw[i] / fps, axis=-1)),
        jnp.asarray(avel_raw[i] / np.maximum(np.linalg.norm(avel_raw[i], axis=-1, keepdims=True), 1e-9)),
    )
    q1_pred = np.asarray(T.quat_mul(dq, jnp.asarray(grot[i])))
    dot = np.abs(np.sum(q1_pred * grot[i + 1], axis=-1))
    assert np.all(dot > 0.995)
