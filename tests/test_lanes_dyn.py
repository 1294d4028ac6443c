"""Lanes-layout Pallas dynamics kernels vs the reference component path."""

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.physics import engine as eng
from phc_tpu.physics import lanes_dyn
from phc_tpu.physics.model import build_smpl_model


def _random_state(model, B, seed=0):
    rng = np.random.default_rng(seed)
    st = eng.default_state(model, B, height=0.9)
    q = rng.normal(0, 0.2, size=(B, model.num_bodies, 4)).astype(np.float32)
    q[..., 3] += 1.0
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.normal(0, 1.0, size=(B, model.num_dofs)).astype(np.float32)
    return st._replace(joint_quat=jnp.asarray(q), vel=jnp.asarray(vel))


def test_bias_lanes_matches_component_path():
    """bias_forces_lanes (interpret mode) must equal engine._bias_comps —
    which is itself pinned to MuJoCo's qfrc_bias in tests/test_physics.py —
    on random states, including non-128-multiple batches."""
    model = build_smpl_model()
    for B in (7, 128):
        state = _random_state(model, B, seed=B)
        frame = eng.forward_kinematics(model, state)
        params = eng._dyn_params(model, frame)
        Sc = eng._motion_subspace_comps(model, frame)
        ref = np.asarray(eng._bias_comps(model, frame, state, params, Sc))
        out = np.asarray(lanes_dyn.bias_forces_lanes(model, frame, state, interpret=True))
        assert out.shape == ref.shape
        scale = np.maximum(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale, rtol=2e-4)
