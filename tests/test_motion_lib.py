"""Tests for the device-resident motion library on the shipped AMASS sample."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phc_tpu.motionlib import MotionLib, get_motion_state, get_root_pos, sample_time_interval

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"


@pytest.fixture(scope="module")
def lib():
    return MotionLib(SAMPLE_PKL, is_deterministic=True)


@pytest.fixture(scope="module")
def data(lib):
    return lib.load_motions(num_motions=4)


def test_load_shapes(lib, data):
    assert data.num_motions == 4
    F = int(np.asarray(data.motion_num_frames).sum())
    assert data.gts.shape == (F, 24, 3)
    assert data.grs.shape == (F, 24, 4)
    assert data.dvs.shape == (F, 23, 3)
    # same clip sampled deterministically 4x
    np.testing.assert_array_equal(np.asarray(data.motion_num_frames), [222] * 4)
    np.testing.assert_allclose(np.asarray(data.motion_lengths), [221 / 30.0] * 4, rtol=1e-6)


def test_height_fix_grounds_clip(data):
    # after the geometry height fix the lowest collision point over the first
    # 30 frames should touch z=0
    from phc_tpu.assets import smpl_humanoid as H

    radii = np.array([g[1][-1] if g[0] != "box" else g[1][2] for g in H.geoms()], np.float32)
    s = int(np.asarray(data.length_starts)[0])
    z = np.asarray(data.gts)[s : s + 30, :, 2] - radii[None, :]
    assert abs(z.min()) < 1e-4


def test_get_motion_state_at_frame_times(data):
    ids = jnp.array([0, 1], dtype=jnp.int32)
    # exactly frame 10: blend = 0 against frame 10
    t = jnp.array([10 / 30.0, 10 / 30.0])
    st = get_motion_state(data, ids, t)
    starts = np.asarray(data.length_starts)
    np.testing.assert_allclose(np.asarray(st.rg_pos[0]), np.asarray(data.gts)[starts[0] + 10], atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.rg_pos[1]), np.asarray(data.gts)[starts[1] + 10], atol=1e-5)
    assert st.dof_pos.shape == (2, 69)
    assert st.dof_vel.shape == (2, 69)
    assert st.rb_rot.shape == (2, 24, 4)


def test_get_motion_state_midframe_blends(data):
    ids = jnp.array([0], dtype=jnp.int32)
    t = jnp.array([10.5 / 30.0])
    st = get_motion_state(data, ids, t)
    s = int(np.asarray(data.length_starts)[0])
    gts = np.asarray(data.gts)
    expect = 0.5 * gts[s + 10] + 0.5 * gts[s + 11]
    np.testing.assert_allclose(np.asarray(st.rg_pos[0]), expect, atol=1e-4)


def test_time_clamping(data):
    ids = jnp.array([0], dtype=jnp.int32)
    st_neg = get_motion_state(data, ids, jnp.array([-1.0]))
    st_long = get_motion_state(data, ids, jnp.array([1e3]))
    s = int(np.asarray(data.length_starts)[0])
    F = int(np.asarray(data.motion_num_frames)[0])
    np.testing.assert_allclose(np.asarray(st_neg.rg_pos[0]), np.asarray(data.gts)[s], atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_long.rg_pos[0]), np.asarray(data.gts)[s + F - 1], atol=1e-5)


def test_offset_applied(data):
    ids = jnp.array([0], dtype=jnp.int32)
    off = jnp.array([[1.0, 2.0, 0.0]])
    st0 = get_motion_state(data, ids, jnp.array([0.5]))
    st1 = get_motion_state(data, ids, jnp.array([0.5]), offset=off)
    np.testing.assert_allclose(
        np.asarray(st1.rg_pos), np.asarray(st0.rg_pos) + np.asarray(off)[:, None, :], atol=1e-5
    )
    # velocities unaffected
    np.testing.assert_allclose(np.asarray(st1.body_vel), np.asarray(st0.body_vel), atol=1e-6)


def test_get_root_pos_matches_state(data):
    ids = jnp.array([0, 2], dtype=jnp.int32)
    t = jnp.array([0.3, 1.7])
    st = get_motion_state(data, ids, t)
    rp = get_root_pos(data, ids, t)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(st.root_pos), atol=1e-5)


def test_sample_time_interval_on_grid(data):
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros(256, dtype=jnp.int32)
    t = np.asarray(sample_time_interval(data, rng, ids))
    steps = t * 30.0
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)
    assert t.min() >= 0
    assert t.max() <= float(np.asarray(data.motion_lengths)[0]) + 1e-6


def test_capacity_padding_keeps_shapes(lib):
    d1 = lib.load_motions(num_motions=2)
    cap = int(np.asarray(d1.motion_num_frames).sum()) + 100
    lib.frame_capacity = cap
    d2 = lib.load_motions(num_motions=2)
    assert d2.gts.shape[0] == cap
    # queries still work
    st = get_motion_state(d2, jnp.array([1], dtype=jnp.int32), jnp.array([0.5]))
    assert np.isfinite(np.asarray(st.rg_pos)).all()
    lib.frame_capacity = None


def test_pmcp_soft_weighting(lib):
    lib.update_soft_sampling_weight([lib.motion_keys[0]])
    assert lib._sampling_prob[0] == 1.0
    lib.update_soft_sampling_weight([])
    np.testing.assert_allclose(lib._sampling_prob, 1.0 / lib.num_unique_motions)


def test_jit_and_vmap_of_state_query(data):
    f = jax.jit(lambda ids, t: get_motion_state(data, ids, t))
    st = f(jnp.array([0, 1], dtype=jnp.int32), jnp.array([0.1, 0.9]))
    assert np.isfinite(np.asarray(st.rg_pos)).all()
