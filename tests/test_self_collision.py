"""Self-collision: pair tables, narrow phase, and repulsion behavior.

The reference enables filtered self-collision through PhysX per-shape
filters (`/root/reference/puffer_phc/envs/humanoid_phc.py:370-381`); here
the same pair set is resolved by a vectorized capsule-capsule narrow phase
inside the implicit contact solve (phc_tpu/physics/engine.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phc_tpu.physics import build_smpl_model, default_state, step
from phc_tpu.physics.engine import (
    _segment_closest_points,
    forward_kinematics,
    self_contact_kinematics,
)


@pytest.fixture(scope="module")
def model():
    return build_smpl_model()


def test_pair_table(model):
    names = list(model.body_names)
    K = model.pair_body.shape[0]
    # 276 unordered pairs - 23 parent-child - 8 filter-excluded = 245
    assert K == 245
    pairs = {(names[a], names[b]) for a, b in model.pair_body}
    # PhysX filter exclusions (filter_a & filter_b != 0) must be absent
    for excl in [
        ("L_Knee", "L_Toe"),
        ("L_Knee", "R_Ankle"),
        ("L_Knee", "R_Toe"),
        ("L_Ankle", "R_Knee"),
        ("L_Toe", "R_Knee"),
        ("R_Knee", "R_Toe"),
        ("Torso", "Chest"),
        ("Chest", "Head"),
    ]:
        assert excl not in pairs and excl[::-1] not in pairs
    # adjacent articulation links never collide
    for j in range(1, 24):
        pc = (names[j], names[model.parents[j]])
        assert pc not in pairs and pc[::-1] not in pairs
    # but e.g. hands against each other / the head are tested
    assert ("L_Hand", "R_Hand") in pairs or ("R_Hand", "L_Hand") in pairs


def test_segment_closest_points_vs_bruteforce():
    rng = np.random.default_rng(0)
    p1, q1, p2, q2 = (rng.normal(size=(64, 3)).astype(np.float32) for _ in range(4))
    # include degenerate segments (spheres)
    q1[:16] = p1[:16]
    q2[8:24] = p2[8:24]
    cp1, cp2 = _segment_closest_points(jnp.asarray(p1), jnp.asarray(q1), jnp.asarray(p2), jnp.asarray(q2))
    d = np.linalg.norm(np.asarray(cp1) - np.asarray(cp2), axis=-1)

    ts = np.linspace(0, 1, 201)
    for i in range(64):
        a = p1[i][None, None] + ts[:, None, None] * (q1[i] - p1[i])
        b = p2[i][None, None] + ts[None, :, None] * (q2[i] - p2[i])
        brute = np.linalg.norm(a - b, axis=-1).min()
        assert d[i] <= brute + 1e-4, (i, d[i], brute)
        assert d[i] >= brute - 5e-3  # grid resolution slack


def test_overlapping_hands_repel(model):
    """Two hands initialized interpenetrating in front of the chest get a
    separating normal contact; without self-collision they don't."""
    B = 1
    state = default_state(model, batch=B, height=5.0)  # air: no ground forces
    names = list(model.body_names)
    dof = np.zeros((B, 23, 3), np.float32)

    # swing both arms forward past parallel (T-pose arms lie along ±y;
    # ∓110° about z points them forward and inward) so the hands overlap
    def set_dof(body, v):
        dof[:, names.index(body) - 1] = v

    set_dof("L_Shoulder", [0.0, 0.0, -1.92])
    set_dof("R_Shoulder", [0.0, 0.0, 1.92])

    from phc_tpu import transforms as T

    ball = T.exp_map_to_quat(jnp.asarray(dof))
    joint_quat = jnp.concatenate([state.joint_quat[:, :1], ball], axis=1)
    state = state._replace(joint_quat=joint_quat)

    frame = forward_kinematics(model, state)
    li, ri = names.index("L_Hand"), names.index("R_Hand")
    gap0 = float(jnp.linalg.norm(frame.pos[0, li] - frame.pos[0, ri]))

    x_a, x_b, v_rel, R_c, pen, active = self_contact_kinematics(model, frame)
    kpair = [
        i
        for i, (a, b) in enumerate(model.pair_body)
        if {names[a], names[b]} == {"L_Hand", "R_Hand"}
    ][0]

    if float(pen[0, kpair]) <= 0.0:
        pytest.skip(f"pose does not interpenetrate (gap {gap0:.3f}) — adjust pose")

    # with self-collision: hands push apart within a few steps
    pd_target = jnp.asarray(dof.reshape(B, 69))
    st = state
    step_j = jax.jit(lambda s: step(model, s, pd_target)[0])
    for _ in range(5):
        st = step_j(st)
    f2 = forward_kinematics(model, st)
    gap_sc = float(jnp.linalg.norm(f2.pos[0, li] - f2.pos[0, ri]))

    model_off = build_smpl_model(self_collision=False)
    st = state
    step_off = jax.jit(lambda s: step(model_off, s, pd_target)[0])
    for _ in range(5):
        st = step_off(st)
    f3 = forward_kinematics(model_off, st)
    gap_off = float(jnp.linalg.norm(f3.pos[0, li] - f3.pos[0, ri]))

    assert gap_sc > gap_off + 1e-3, (gap0, gap_sc, gap_off)
    assert np.all(np.isfinite(np.asarray(st.vel)))


def test_self_collision_stable_at_rest(model):
    """Default standing pose: self-contacts (if any) must not destabilize."""
    state = default_state(model, batch=2, height=0.94)
    pd_target = jnp.zeros((2, 69))
    step_j = jax.jit(lambda s: step(model, s, pd_target)[0])
    for _ in range(30):
        state = step_j(state)
    z = np.asarray(state.root_pos[:, 2])
    assert np.all(z > 0.6) and np.all(z < 1.2), z
    assert np.abs(np.asarray(state.vel)).max() < 8.0


def test_disabled_model_has_no_pairs():
    m = build_smpl_model(self_collision=False)
    assert m.pair_body.shape == (0, 2)


def test_compaction_matches_dense():
    """top-k contact compaction is exact while <= max_contacts candidates
    are active: stepping from a grounded pose must match the dense path."""
    import dataclasses

    model_c = build_smpl_model()
    model_d = dataclasses.replace(model_c, max_contacts=0)
    assert model_c.max_contacts > 0

    state = default_state(model_c, batch=4, height=0.91)
    rngv = np.random.default_rng(0).normal(size=(4, model_c.num_dofs)) * 0.3
    state = state._replace(vel=jnp.asarray(rngv.astype(np.float32)))
    tgt = jnp.asarray(0.1 * np.random.default_rng(1).normal(size=(4, 69)).astype(np.float32))

    sc, sd = state, state
    step_c = jax.jit(lambda s: step(model_c, s, tgt))
    step_d = jax.jit(lambda s: step(model_d, s, tgt))
    for _ in range(10):
        sc, info_c = step_c(sc)
        sd, info_d = step_d(sd)
    np.testing.assert_allclose(np.asarray(sc.root_pos), np.asarray(sd.root_pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sc.vel), np.asarray(sd.vel), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(info_c["contact_forces"]), np.asarray(info_d["contact_forces"]),
        atol=1e-2, rtol=1e-3,
    )
