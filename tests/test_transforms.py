"""Unit tests for phc_tpu.transforms against scipy.spatial.transform oracles.

The reference has no tests (SURVEY.md §4); these establish the quaternion
conventions (xyzw, Hamilton product, heading-about-z) that every layer above
relies on.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

from phc_tpu import transforms as T

RNG = np.random.default_rng(0)


def random_quats(n):
    q = sRot.random(n, random_state=42).as_quat()  # xyzw
    return q.astype(np.float32)


def test_quat_mul_matches_scipy():
    a, b = random_quats(64), random_quats(64)
    got = np.asarray(T.quat_mul(jnp.array(a), jnp.array(b)))
    want = (sRot.from_quat(a) * sRot.from_quat(b)).as_quat()
    # sign ambiguity: compare rotations
    dot = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_scipy():
    q = random_quats(128)
    v = RNG.normal(size=(128, 3)).astype(np.float32)
    got = np.asarray(T.quat_rotate(jnp.array(q), jnp.array(v)))
    want = sRot.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quat_rotate_broadcasts():
    q = jnp.array(random_quats(8)).reshape(2, 4, 4)
    v = jnp.array(RNG.normal(size=(2, 4, 3)).astype(np.float32))
    out = T.quat_rotate(q, v)
    assert out.shape == (2, 4, 3)
    flat = T.quat_rotate(q.reshape(-1, 4), v.reshape(-1, 3))
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 3), np.asarray(flat), atol=1e-6)


def test_conjugate_inverts_rotation():
    q = jnp.array(random_quats(32))
    v = jnp.array(RNG.normal(size=(32, 3)).astype(np.float32))
    back = T.quat_rotate(T.quat_conjugate(q), T.quat_rotate(q, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-4)


def test_exp_map_round_trip():
    q = jnp.array(random_quats(64))
    em = T.quat_to_exp_map(q)
    q2 = T.exp_map_to_quat(em)
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_exp_map_matches_scipy_rotvec():
    q = random_quats(64)
    got = np.asarray(T.quat_to_exp_map(jnp.array(q)))
    want = sRot.from_quat(q).as_rotvec()
    # both should represent the same rotation (rotvec is unique for angle<pi)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quat_to_angle_axis_identity_fallback():
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    angle, axis = T.quat_to_angle_axis(q)
    np.testing.assert_allclose(np.asarray(angle), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(axis), [[0.0, 0.0, 1.0]], atol=1e-6)


def test_slerp_endpoints_and_midpoint():
    q0, q1 = random_quats(16), random_quats(16)
    t0 = np.zeros((16, 1), np.float32)
    t1 = np.ones((16, 1), np.float32)
    s0 = np.asarray(T.slerp(jnp.array(q0), jnp.array(q1), jnp.array(t0)))
    s1 = np.asarray(T.slerp(jnp.array(q0), jnp.array(q1), jnp.array(t1)))
    np.testing.assert_allclose(np.abs(np.sum(s0 * q0, -1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.abs(np.sum(s1 * q1, -1)), 1.0, atol=1e-4)

    # midpoint matches scipy Slerp
    from scipy.spatial.transform import Slerp

    for i in range(4):
        sl = Slerp([0, 1], sRot.from_quat(np.stack([q0[i], q1[i]])))
        want = sl(0.5).as_quat()
        got = np.asarray(T.slerp(jnp.array(q0[i]), jnp.array(q1[i]), jnp.array([0.5])))
        assert abs(np.dot(got, want)) > 1 - 1e-4


def test_slerp_near_parallel_falls_back_to_lerp():
    q = random_quats(8)
    out = np.asarray(T.slerp(jnp.array(q), jnp.array(q), jnp.array([[0.3]] * 8)))
    np.testing.assert_allclose(out, q, atol=1e-5)


def test_heading_extracts_yaw():
    yaw = RNG.uniform(-np.pi, np.pi, size=32)
    pitch = RNG.uniform(-0.4, 0.4, size=32)
    roll = RNG.uniform(-0.4, 0.4, size=32)
    q = sRot.from_euler("ZYX", np.stack([yaw, pitch, roll], -1)).as_quat().astype(np.float32)
    got = np.asarray(T.calc_heading(jnp.array(q)))
    np.testing.assert_allclose(got, yaw, atol=1e-4)


def test_heading_quat_inv_levels_heading():
    q = jnp.array(random_quats(32))
    hq_inv = T.calc_heading_quat_inv(q)
    leveled = T.quat_mul(hq_inv, q)
    # after removing heading, the body x-axis should have zero yaw
    headings = np.asarray(T.calc_heading(leveled))
    np.testing.assert_allclose(headings, 0.0, atol=1e-4)


def test_tan_norm_encoding():
    q = jnp.array(random_quats(32))
    tn = np.asarray(T.quat_to_tan_norm(q))
    R = sRot.from_quat(np.asarray(q)).as_matrix()
    np.testing.assert_allclose(tn[:, :3], R[:, :, 0], atol=1e-4)  # rotated x-axis
    np.testing.assert_allclose(tn[:, 3:], R[:, :, 2], atol=1e-4)  # rotated z-axis


def test_rotmat_round_trip():
    q = jnp.array(random_quats(64))
    m = T.quat_to_rotmat(q)
    want = sRot.from_quat(np.asarray(q)).as_matrix()
    np.testing.assert_allclose(np.asarray(m), want, atol=1e-5)
    q2 = T.rotmat_to_quat(m)
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_transform_mul_and_inverse():
    qa, qb = random_quats(16), random_quats(16)
    ta = RNG.normal(size=(16, 3)).astype(np.float32)
    tb = RNG.normal(size=(16, 3)).astype(np.float32)
    xa = T.transform_from_rotation_translation(jnp.array(qa), jnp.array(ta))
    xb = T.transform_from_rotation_translation(jnp.array(qb), jnp.array(tb))
    xab = T.transform_mul(xa, xb)

    p = jnp.array(RNG.normal(size=(16, 3)).astype(np.float32))
    got = np.asarray(T.transform_apply(xab, p))
    want = np.asarray(T.transform_apply(xa, T.transform_apply(xb, p)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    ident = T.transform_mul(xa, T.transform_inverse(xa))
    np.testing.assert_allclose(np.asarray(T.transform_translation(ident)), 0.0, atol=1e-4)
    back = np.asarray(T.transform_apply(T.transform_inverse(xa), T.transform_apply(xa, p)))
    np.testing.assert_allclose(back, np.asarray(p), atol=1e-4)
