"""Physics model builder: humanoid description tables -> static model arrays.

Replaces the role of Isaac Gym's asset loader + `gym.prepare_sim`
(`/root/reference/puffer_phc/envs/humanoid_phc.py:185-230, 264-326`): mass
properties are derived from collision geometry densities exactly as MuJoCo/
PhysX do, PD gains and armature come from the per-joint tables, and a list
of candidate ground-contact points is precomputed from the geoms.

Everything here is static (numpy) — captured as constants when the step
function is traced; only `PhysicsState` (see engine.py) is a device pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def derived_cache(model: "PhysicsModel") -> dict:
    """Per-model memo dict for derived constant tables (candidate tables,
    kernel layouts, ...). Stored on the model instance itself (via
    object.__setattr__, legal on frozen dataclasses) so the cache's lifetime
    is exactly the model's — unlike the earlier id(model)-keyed module
    globals, a recycled address can never alias a new model's tables."""
    cache = model.__dict__.get("_derived_cache")
    if cache is None:
        cache = {}
        object.__setattr__(model, "_derived_cache", cache)
    return cache


@dataclass(frozen=True)
class PhysicsModel:
    """Static articulated-body model (trace-time constant)."""

    # topology
    body_names: tuple
    parents: np.ndarray  # (J,) int32, -1 root
    local_offsets: np.ndarray  # (J, 3) joint anchor in parent frame
    levels: tuple  # topological levels (from kinematics)
    ancestor_mask: np.ndarray  # (J, J) bool; [i, j] = j is ancestor-or-self of i

    # mass properties (body frame, about joint anchor = body origin)
    mass: np.ndarray  # (J,)
    com: np.ndarray  # (J, 3) center of mass in body frame
    inertia: np.ndarray  # (J, 3, 3) about COM, body frame

    # actuation (69 dofs = 23 ball joints x 3)
    kp: np.ndarray  # (69,)
    kd: np.ndarray  # (69,)
    armature: np.ndarray  # (69,)
    dof_limit: np.ndarray  # (69,) symmetric range (rad)

    # contacts
    contact_body: np.ndarray  # (P,) int32 body index per candidate point
    contact_pos: np.ndarray  # (P, 3) point in body frame
    contact_radius: np.ndarray  # (P,)

    # self-collision pairs (K = 0 when disabled). Each body's collision
    # shape is reduced to one capsule (sphere = zero-length, box = segment
    # along its longest axis) for the pairwise narrow phase; pair selection
    # replicates PhysX semantics (collide iff filter_a & filter_b == 0,
    # adjacent articulation links auto-excluded) with the reference's
    # per-shape filter table (`humanoid_phc.py:370-381`).
    pair_body: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.int32))
    pair_seg: np.ndarray = field(default_factory=lambda: np.zeros((0, 2, 2, 3), np.float32))
    pair_rad: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.float32))

    # parameters
    gravity: float = -9.81
    friction: float = 1.0
    dt: float = 1.0 / 60.0
    substeps: int = 2  # physics steps per control step (30 Hz control)
    contact_stiffness: float = 2.0e4
    contact_damping: float = 6.0e2
    # Smooth Coulomb regularization: tangential force is
    # -min(mu*N/(|v_t|+eps), coef_max) * v_t. eps sets the stiction slip
    # scale — at 0.1 m/s a 200 N push-off needed ~10 cm/s of foot slip and
    # walk initiation was impossible (oracle-tracking diverged 3.4x faster
    # than the same pose replayed in MuJoCo, experiments/mj_pd_hold.py).
    # 5 mm/s brings steady-slip under full push-off to ~2 mm/s (coef_max
    # binds). Stable because the friction coefficient rides the implicit
    # LHS (engine `dt * J^T c J`), not the explicit force.
    contact_vel_eps: float = 0.005  # smooth Coulomb regularization (m/s)
    # Stability caps, PhysX-parity (the reference steps PhysX with
    # max_depenetration_velocity=10 m/s, `envs/isaacgym_env.py:22`, and
    # PhysX articulation links carry a 64 rad/s default velocity cap).
    # Without them a single env in a 4096 batch can run away
    # (deep tunneling -> huge penalty force -> velocity blowup -> inf/NaN
    # that then poisons the PPO update; observed at ~epoch 85 at 4096 envs).
    # In the normal operating regime (|v| < ~35, pen < 5 cm) none of these
    # bind, so MuJoCo-pinned dynamics tests are unaffected.
    max_depenetration_velocity: float = 10.0  # caps k*pen restoring velocity
    max_velocity: float = 64.0  # hard |v| cap per generalized coordinate
    friction_coef_max: float = 1.0e5  # cap on the regularized Coulomb coeff
    # contact compaction: per env, only the max_contacts deepest-penetrating
    # candidates (of the ~310 static ground points + self-collision pairs)
    # get Jacobian rows each substep. Exact whenever <= max_contacts are
    # simultaneously active; 5x less Jacobian/LHS work than the dense path.
    # 0 = dense (no compaction).
    # 40 divides the 8-sublane tile exactly, so the r4 section padding
    # (slots -> ceil8) adds NO dead slots: the merged Jacobian is 3A = 120
    # live columns (vs 42 -> pad 48 -> 144 with 18 dead columns, -17%
    # across the Jacobian/Gram/W/fused-kernel chain). Safety margin
    # measured on 512 envs x 200 random-action fall steps (the
    # contact-richest regime, /tmp census r5): max simultaneous pen>0
    # candidates 18, max within the 3 cm mid-substep activation band 30 —
    # both well under 40.
    max_contacts: int = 40
    # SPD solver for the substep: "auto" = Pallas lanes Cholesky on TPU,
    # recursive-Schur block inverse elsewhere; "lanes"/"schur" force one.
    solver: str = "auto"
    # "full": every substep recomputes FK/dynamics/contacts.
    # "frozen": build + factor the system once per control step, run the
    # substeps as TGS-style velocity iterations against the frozen factor
    # (engine._step_frozen) — ~half the physics cost per control step.
    substep_mode: str = "full"

    @property
    def num_bodies(self) -> int:
        return len(self.body_names)

    @property
    def num_dofs(self) -> int:
        return 6 + 3 * (self.num_bodies - 1)

    @property
    def control_dt(self) -> float:
        return self.dt * self.substeps


def _sphere_inertia(m, r):
    i = 0.4 * m * r * r
    return np.diag([i, i, i])


def _box_inertia(m, half):
    hx, hy, hz = half
    return np.diag(
        [
            m / 3.0 * (hy * hy + hz * hz),
            m / 3.0 * (hx * hx + hz * hz),
            m / 3.0 * (hx * hx + hy * hy),
        ]
    )


def _capsule_mass_com_inertia(density, r, p1, p2):
    """Capsule = cylinder + two hemispherical caps, axis p1->p2 (MuJoCo's
    density-based computation)."""
    p1, p2 = np.asarray(p1, np.float64), np.asarray(p2, np.float64)
    axis = p2 - p1
    h = np.linalg.norm(axis)
    center = 0.5 * (p1 + p2)

    m_cyl = density * np.pi * r * r * h
    m_sph = density * (4.0 / 3.0) * np.pi * r**3
    m = m_cyl + m_sph

    # inertia about capsule center, z along the axis
    iz = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
    # cylinder transverse + hemispheres transverse (each hemisphere at h/2 end)
    i_cyl_t = m_cyl * (3 * r * r + h * h) / 12.0
    # hemisphere about its own COM: 83/320 m r^2... use full-sphere split:
    # treat the two caps as one sphere whose halves sit at +-h/2 with the
    # standard parallel-axis shift used by MuJoCo: I = 0.4 m_s r^2 +
    # m_s (0.5 h)^2 + (3/8) m_s r h  (exact hemispherical cap formula)
    i_caps_t = 0.4 * m_sph * r * r + m_sph * (0.25 * h * h + (3.0 / 8.0) * r * h)
    it = i_cyl_t + i_caps_t

    inertia_local = np.diag([it, it, iz])

    # rotate local z-axis to capsule axis
    if h > 1e-9:
        z = axis / h
    else:
        z = np.array([0.0, 0.0, 1.0])
    # build orthonormal frame
    a = np.array([1.0, 0.0, 0.0]) if abs(z[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(a, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    inertia = R @ inertia_local @ R.T
    return m, center, inertia


def _geom_mass_properties(geom):
    gtype, size, loc, quat, density = geom
    if gtype == "sphere":
        r = size[0]
        m = density * (4.0 / 3.0) * np.pi * r**3
        return m, np.asarray(loc[1], np.float64), _sphere_inertia(m, r)
    if gtype == "capsule":
        r = size[0]
        ft = loc[1]
        return _capsule_mass_com_inertia(density, r, ft[:3], ft[3:])
    if gtype == "box":
        half = np.asarray(size, np.float64)
        m = density * 8.0 * half.prod()
        # boxes in the asset have identity quat
        return m, np.asarray(loc[1], np.float64), _box_inertia(m, half)
    raise ValueError(f"unsupported geom type {gtype}")


def _geom_contact_points(body_idx, geom):
    """Candidate ground-contact points: sphere center, capsule endpoints, box
    bottom+top corners (radius 0 for boxes)."""
    gtype, size, loc, quat, density = geom
    pts, radii = [], []
    if gtype == "sphere":
        pts.append(np.asarray(loc[1], np.float64))
        radii.append(size[0])
    elif gtype == "capsule":
        ft = np.asarray(loc[1], np.float64)
        pts += [ft[:3], ft[3:]]
        radii += [size[0], size[0]]
    elif gtype == "box":
        c = np.asarray(loc[1], np.float64)
        half = np.asarray(size, np.float64)
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    pts.append(c + half * np.array([sx, sy, sz]))
                    radii.append(0.0)
    return [(body_idx, p, r) for p, r in zip(pts, radii)]


# Per-shape PhysX collision filters for the capsule (non-mesh) humanoid —
# the reference sets these when `robot.has_self_collision` is on
# (`humanoid_phc.py:370-381`); shapes a, b collide iff filter_a & filter_b == 0.
_SELF_COLLISION_FILTERS = (
    0, 0, 7, 16, 12, 0, 56, 2, 33, 128, 0, 192, 0, 64, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
)  # fmt: skip


def _geom_collision_segment(geom):
    """Reduce a geom to one capsule (segment + radius) for the pairwise
    narrow phase. Spheres are zero-length capsules; boxes become a segment
    along their longest axis with the mean of the other two half-extents as
    radius (boxes are only the feet; this approximation affects only
    self-collision, not mass properties or ground contact)."""
    gtype, size, loc, quat, density = geom
    if gtype == "sphere":
        c = np.asarray(loc[1], np.float64)
        return c, c, float(size[0])
    if gtype == "capsule":
        ft = np.asarray(loc[1], np.float64)
        return ft[:3], ft[3:], float(size[0])
    if gtype == "box":
        c = np.asarray(loc[1], np.float64)
        half = np.asarray(size, np.float64)
        k = int(np.argmax(half))
        axis = np.zeros(3)
        others = [half[i] for i in range(3) if i != k]
        r = float(np.mean(others))
        axis[k] = max(half[k] - r, 0.0)
        return c - axis, c + axis, r
    raise ValueError(f"unsupported geom type {gtype}")


def _build_collision_pairs(parents, geoms):
    """All body pairs that PhysX would test: i<j, not parent-child (adjacent
    articulation links never collide), filters disjoint."""
    J = len(geoms)
    segs = [_geom_collision_segment(g) for g in geoms]
    pair_body, pair_seg, pair_rad = [], [], []
    for i in range(J):
        for j in range(i + 1, J):
            if parents[j] == i or parents[i] == j:
                continue
            if _SELF_COLLISION_FILTERS[i] & _SELF_COLLISION_FILTERS[j]:
                continue
            pair_body.append((i, j))
            pair_seg.append(((segs[i][0], segs[i][1]), (segs[j][0], segs[j][1])))
            pair_rad.append((segs[i][2], segs[j][2]))
    return (
        np.asarray(pair_body, np.int32).reshape(-1, 2),
        np.asarray(pair_seg, np.float32).reshape(-1, 2, 2, 3),
        np.asarray(pair_rad, np.float32).reshape(-1, 2),
    )


def build_smpl_model(
    kp_scale: float = 1.0,
    kd_scale: float = 1.0,
    dt: float = 1.0 / 60.0,
    substeps: int = 2,
    contact_stiffness: float = 2.0e4,
    contact_damping: float = 6.0e2,
    friction: float = 1.0,
    self_collision: bool = True,
    substep_mode: str = "full",
) -> PhysicsModel:
    """Build the SMPL humanoid physics model from the asset tables.

    kp_scale/kd_scale mirror the reference env config knobs
    (`config.py:91-92`, applied at `humanoid_phc.py:279-280`).
    """
    from phc_tpu.assets import smpl_humanoid as H
    from phc_tpu.kinematics import _compute_levels

    names = H.body_names()
    parents = np.asarray(H.parent_indices(), np.int32)
    offsets = np.asarray(H.local_offsets(), np.float64)
    J = len(names)

    mass = np.zeros(J)
    com = np.zeros((J, 3))
    inertia = np.zeros((J, 3, 3))
    contact_list = []
    for i, geom in enumerate(H.geoms()):
        m, c, I = _geom_mass_properties(geom)
        mass[i] = m
        com[i] = c
        inertia[i] = I
        contact_list += _geom_contact_points(i, geom)

    gains = H.joint_gains()  # per non-root body: (kp, kd, armature, range_deg)
    kp = np.repeat([g[0] for g in gains], 3) * kp_scale
    kd = np.repeat([g[1] for g in gains], 3) * kd_scale
    armature = np.repeat([g[2] for g in gains], 3)
    dof_limit = np.deg2rad(np.repeat([g[3] for g in gains], 3))

    ancestor = np.zeros((J, J), bool)
    for i in range(J):
        j = i
        while j != -1:
            ancestor[i, j] = True
            j = int(parents[j])

    if self_collision:
        pair_body, pair_seg, pair_rad = _build_collision_pairs(parents, H.geoms())
    else:
        pair_body = np.zeros((0, 2), np.int32)
        pair_seg = np.zeros((0, 2, 2, 3), np.float32)
        pair_rad = np.zeros((0, 2), np.float32)

    return PhysicsModel(
        body_names=names,
        parents=parents,
        local_offsets=offsets.astype(np.float32),
        levels=_compute_levels(parents),
        ancestor_mask=ancestor,
        mass=mass.astype(np.float32),
        com=com.astype(np.float32),
        inertia=inertia.astype(np.float32),
        kp=kp.astype(np.float32),
        kd=kd.astype(np.float32),
        armature=armature.astype(np.float32),
        dof_limit=dof_limit.astype(np.float32),
        contact_body=np.asarray([c[0] for c in contact_list], np.int32),
        contact_pos=np.asarray([c[1] for c in contact_list], np.float32),
        contact_radius=np.asarray([c[2] for c in contact_list], np.float32),
        pair_body=pair_body,
        pair_seg=pair_seg,
        pair_rad=pair_rad,
        dt=dt,
        substeps=substeps,
        substep_mode=substep_mode,
        contact_stiffness=contact_stiffness,
        contact_damping=contact_damping,
        friction=friction,
    )


def build_pd_action_offset_scale(model: PhysicsModel, bias_offset: bool = False) -> tuple:
    """Action [-1,1] -> PD target mapping (reference `humanoid_phc.py:385-446`).

    bias_offset=False (default): per 3-dof joint, scale = min(1.2 *
    max|limit|, pi) symmetric (offset 0 for the symmetric asset limits).
    bias_offset=True (:422-435): mid-centered range stretched by 0.7 *
    (high - low) — with symmetric limits that is offset 0, scale = 1.4 *
    limit, uncapped. The knee y-axis scale override to 5 ('stronger knee'
    hack, :441-446) applies in both branches.
    """
    if bias_offset:
        scale = 1.4 * model.dof_limit
    else:
        scale = np.minimum(1.2 * model.dof_limit, np.pi)
    offset = np.zeros_like(scale)
    names = [n for n in model.body_names[1:]]
    l_knee = names.index("L_Knee") * 3 + 1
    r_knee = names.index("R_Knee") * 3 + 1
    scale[l_knee] = 5.0
    scale[r_knee] = 5.0
    return offset.astype(np.float32), scale.astype(np.float32)
