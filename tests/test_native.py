"""Native C++ kernels vs the numpy/jax reference implementations."""

import numpy as np
import pytest

from phc_tpu import native
from phc_tpu import kinematics as K
from phc_tpu.assets import smpl_humanoid as H

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")

RNG = np.random.default_rng(0)


def _random_locals(F=50):
    from scipy.spatial.transform import Rotation as sRot

    q = sRot.random(F * 24, random_state=5).as_quat().reshape(F, 24, 4).astype(np.float32)
    # normalize sign like the framework does
    q = np.where(q[..., 3:4] < 0, -q, q)
    trans = RNG.normal(size=(F, 3)).astype(np.float32)
    return q, trans


def test_native_fk_matches_numpy():
    tree = H.skeleton_tree()
    lrs, trans = _random_locals()
    grs_c, gts_c = native.fk(lrs, trans, tree.parent_indices, tree.local_translation)
    grs_np, gts_np = K.forward_kinematics_np(tree, lrs, trans)
    np.testing.assert_allclose(gts_c, gts_np, atol=1e-5)
    dot = np.abs(np.sum(grs_c * grs_np, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_native_derivatives_match_numpy():
    tree = H.skeleton_tree()
    lrs, trans = _random_locals(F=40)
    grs, gts = K.forward_kinematics_np(tree, lrs, trans)
    fps = 30.0
    gvs_c, gavs_c, dvs_c = native.motion_derivatives(gts, grs, lrs, fps)
    gvs_np = K.compute_linear_velocity(gts, 1.0 / fps)
    gavs_np = K.compute_angular_velocity(grs, 1.0 / fps)
    dvs_np = K.compute_dof_velocities(lrs, fps)
    np.testing.assert_allclose(gvs_c, gvs_np, atol=1e-3)
    np.testing.assert_allclose(gavs_c, gavs_np, atol=2e-2)  # acos fp32 sensitivity
    np.testing.assert_allclose(dvs_c, dvs_np, atol=2e-2)


def test_native_gae_matches_numpy():
    T, B = 64, 16
    dones = (RNG.random((T, B)) < 0.1).astype(np.float32)
    values = RNG.normal(size=(T, B)).astype(np.float32)
    rewards = RNG.normal(size=(T, B)).astype(np.float32)
    adv = native.gae(dones, values, rewards, 0.98, 0.2)

    advr = np.zeros((T, B), np.float32)
    last = np.zeros(B, np.float32)
    for t in range(T - 2, -1, -1):
        nn = 1 - dones[t + 1]
        delta = rewards[t + 1] + 0.98 * values[t + 1] * nn - values[t]
        last = delta + 0.98 * 0.2 * nn * last
        advr[t] = last
    np.testing.assert_allclose(adv, advr, atol=1e-5)
