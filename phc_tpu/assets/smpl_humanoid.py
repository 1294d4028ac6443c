"""SMPL humanoid rigid-body description (numeric tables).

The canonical 24-body / 69-hinge-dof SMPL humanoid used by PHC, expressed
as plain Python data: per-body parent/offset, per-joint PD gains and
armature, and collision geometry with densities. Content-equivalent to the
reference's MJCF asset (`puffer_phc/assets/smpl_humanoid.xml`) so that
policies and motions transfer; the tables are consumed directly by
`phc_tpu.physics.model` and can be serialized back to MJCF via `to_mjcf()`
for MuJoCo-based validation and visualization.
"""

# (name, parent, offset_xyz, joint_gains=(kp, kd, armature, range_deg) or None,
#  geom=(type, size, fromto_or_pos, quat_or_None, density))
BODIES = [
    ('Pelvis', None, (-0.0018, -0.2233, 0.0282),
     None,
     ('sphere', (0.0942,), ('pos', (0.0, 0.0, 0.0)), (1.0, 0.0, 0.0, 0.0), 4629.6296296296305)),
    ('L_Hip', 'Pelvis', (-0.0068, 0.0695, -0.0914),
     (800.0, 80.0, 0.02, 180.0),
     ('capsule', (0.0615,), ('fromto', (-0.0009, 0.0069, -0.075, -0.0036, 0.0274, -0.3002)), (1.0, 0.0, 0.0, 0.0), 2040.816327)),
    ('L_Knee', 'L_Hip', (-0.0045, 0.0343, -0.3752),
     (800.0, 80.0, 0.02, 180.0),
     ('capsule', (0.0541,), ('fromto', (-0.0087, -0.0027, -0.0796, -0.035, -0.0109, -0.3184)), (1.0, 0.0, 0.0, 0.0), 1234.567901)),
    ('L_Ankle', 'L_Knee', (-0.0437, -0.0136, -0.398),
     (800.0, 80.0, 0.02, 180.0),
     ('box', (0.085, 0.0483, 0.0464), ('pos', (0.0242, 0.0233, -0.0239)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('L_Toe', 'L_Ankle', (0.1193, 0.0264, -0.0558),
     (500.0, 50.0, 0.02, 180.0),
     ('box', (0.0496, 0.0478, 0.02), ('pos', (0.0248, -0.003, 0.0055)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Hip', 'Pelvis', (-0.0043, -0.0677, -0.0905),
     (800.0, 80.0, 0.02, 180.0),
     ('capsule', (0.0606,), ('fromto', (-0.0018, -0.0077, -0.0765, -0.0071, -0.0306, -0.3061)), (1.0, 0.0, 0.0, 0.0), 2040.816327)),
    ('R_Knee', 'R_Hip', (-0.0089, -0.0383, -0.3826),
     (800.0, 80.0, 0.02, 180.0),
     ('capsule', (0.0541,), ('fromto', (-0.0085, 0.0032, -0.0797, -0.0338, 0.0126, -0.3187)), (1.0, 0.0, 0.0, 0.0), 1234.567901)),
    ('R_Ankle', 'R_Knee', (-0.0423, 0.0158, -0.3984),
     (800.0, 80.0, 0.02, 180.0),
     ('box', (0.0865, 0.0483, 0.0478), ('pos', (0.0256, -0.0212, -0.0174)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Toe', 'R_Ankle', (0.1233, -0.0254, -0.0481),
     (500.0, 50.0, 0.02, 180.0),
     ('box', (0.0493, 0.0479, 0.0216), ('pos', (0.0227, 0.0042, 0.0045)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('Torso', 'Pelvis', (-0.0267, -0.0025, 0.109),
     (1000.0, 100.0, 0.02, 180.0),
     ('capsule', (0.0769,), ('fromto', (0.0005, 0.0025, 0.0608, 0.0006, 0.003, 0.0743)), (1.0, 0.0, 0.0, 0.0), 2040.816327)),
    ('Spine', 'Torso', (0.0011, 0.0055, 0.1352),
     (1000.0, 100.0, 0.02, 180.0),
     ('capsule', (0.0755,), ('fromto', (0.0114, 0.0007, 0.0238, 0.014, 0.0008, 0.0291)), (1.0, 0.0, 0.0, 0.0), 2040.816327)),
    ('Chest', 'Spine', (0.0254, 0.0015, 0.0529),
     (1000.0, 100.0, 0.02, 180.0),
     ('capsule', (0.1002,), ('fromto', (-0.0173, -0.0009, 0.0682, -0.0212, -0.001, 0.0833)), (1.0, 0.0, 0.0, 0.0), 2040.816327)),
    ('Neck', 'Chest', (-0.0429, -0.0028, 0.2139),
     (500.0, 50.0, 0.02, 180.0),
     ('capsule', (0.0436,), ('fromto', (0.0103, 0.001, 0.013, 0.0411, 0.0041, 0.052)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('Head', 'Neck', (0.0513, 0.0052, 0.065),
     (500.0, 50.0, 0.02, 180.0),
     ('sphere', (0.1011,), ('pos', (0.0, 0.0, 0.0)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('L_Thorax', 'Chest', (-0.0341, 0.0788, 0.1217),
     (500.0, 50.0, 0.02, 180.0),
     ('capsule', (0.0521,), ('fromto', (-0.0018, 0.0182, 0.0061, -0.0071, 0.0728, 0.0244)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('L_Shoulder', 'L_Thorax', (-0.0089, 0.091, 0.0305),
     (500.0, 50.0, 0.02, 720.0),
     ('capsule', (0.0517,), ('fromto', (-0.0055, 0.0519, -0.0026, -0.022, 0.2077, -0.0102)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('L_Elbow', 'L_Shoulder', (-0.0275, 0.2596, -0.0128),
     (500.0, 50.0, 0.02, 720.0),
     ('capsule', (0.0405,), ('fromto', (-0.0002, 0.0498, 0.0018, -0.0009, 0.1994, 0.0072)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('L_Wrist', 'L_Elbow', (-0.0012, 0.2492, 0.009),
     (300.0, 30.0, 0.02, 180.0),
     ('capsule', (0.0318,), ('fromto', (-0.003, 0.0168, -0.0016, -0.012, 0.0672, -0.0065)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('L_Hand', 'L_Wrist', (-0.0149, 0.084, -0.0082),
     (300.0, 30.0, 0.02, 180.0),
     ('sphere', (0.0337,), ('pos', (0.0, 0.0, 0.0)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Thorax', 'Chest', (-0.0386, -0.0818, 0.1188),
     (500.0, 50.0, 0.02, 180.0),
     ('capsule', (0.0511,), ('fromto', (-0.0018, -0.0192, 0.0065, -0.0073, -0.0768, 0.026)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Shoulder', 'R_Thorax', (-0.0091, -0.096, 0.0326),
     (500.0, 50.0, 0.02, 720.0),
     ('capsule', (0.0531,), ('fromto', (-0.0043, -0.0507, -0.0027, -0.0171, -0.203, -0.0107)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Elbow', 'R_Shoulder', (-0.0214, -0.2537, -0.0133),
     (500.0, 50.0, 0.02, 720.0),
     ('capsule', (0.0408,), ('fromto', (-0.0011, -0.0511, 0.0016, -0.0044, -0.2042, 0.0062)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Wrist', 'R_Elbow', (-0.0056, -0.2553, 0.0078),
     (300.0, 30.0, 0.02, 180.0),
     ('capsule', (0.0326,), ('fromto', (-0.0021, -0.0169, -0.0012, -0.0083, -0.0677, -0.0049)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
    ('R_Hand', 'R_Wrist', (-0.0103, -0.0846, -0.0061),
     (300.0, 30.0, 0.02, 180.0),
     ('sphere', (0.034,), ('pos', (0.0, 0.0, 0.0)), (1.0, 0.0, 0.0, 0.0), 1000.0)),
]

def body_names():
    return tuple(b[0] for b in BODIES)


def parent_indices():
    names = body_names()
    return tuple(-1 if b[1] is None else names.index(b[1]) for b in BODIES)


def local_offsets():
    return tuple(b[2] for b in BODIES)


def joint_gains():
    """(kp, kd, armature, range_deg) per non-root body, in body order."""
    return tuple(b[3] for b in BODIES if b[3] is not None)


def geoms():
    return tuple(b[4] for b in BODIES)


# Default physics material parameters (matching the reference asset's
# defaults section and Isaac Gym plane config, `isaacgym_env.py:15-27`):
FRICTION = (1.0, 0.05, 0.05)  # sliding, torsional, rolling
SIM_TIMESTEP = 1.0 / 60.0
CONTROL_FREQ_INV = 2  # 2 physics substeps per control step -> 30 Hz control
CHAR_HEIGHT = 0.89  # default spawn height of the pelvis


def skeleton_tree():
    """Build a `phc_tpu.kinematics.SkeletonTree` from the tables."""
    import numpy as np

    from phc_tpu.kinematics import SkeletonTree

    return SkeletonTree(
        node_names=body_names(),
        parent_indices=np.asarray(parent_indices(), dtype=np.int32),
        local_translation=np.asarray(local_offsets(), dtype=np.float32),
    )


def to_mjcf(timestep: float = SIM_TIMESTEP, joint_type: str = "hinge") -> str:
    """Serialize the tables to an MJCF string for MuJoCo validation/viz.

    joint_type="hinge" emits 3 stacked x/y/z hinges per joint (the reference
    asset's encoding); joint_type="ball" emits one ball joint per body, which
    matches phc_tpu's exp-map spherical joint model exactly and is used as
    the MuJoCo oracle for CRBA/RNEA/FK validation tests.
    """
    import io

    out = io.StringIO()
    w = out.write
    w('<mujoco model="smpl_humanoid">\n')
    w('  <compiler coordinate="local"/>\n')
    w(f'  <option timestep="{timestep}"/>\n')
    w('  <default>\n')
    w('    <geom type="capsule" condim="3" friction="1.0 0.05 0.05"/>\n')
    w('    <joint type="hinge" limited="true"/>\n')
    w('  </default>\n')
    w('  <worldbody>\n')
    w('    <geom name="floor" type="plane" size="100 100 .2" pos="0 0 0" condim="3"/>\n')

    names = body_names()
    children = {n: [] for n in names}
    for b in BODIES:
        if b[1] is not None:
            children[b[1]].append(b[0])
    by_name = {b[0]: b for b in BODIES}

    def emit(name, indent):
        b = by_name[name]
        pad = "  " * indent
        pos = " ".join(f"{v:.6g}" for v in b[2])
        w(f'{pad}<body name="{name}" pos="{pos}">\n')
        if b[3] is None:
            w(f'{pad}  <freejoint name="{name}"/>\n')
        elif joint_type == "ball":
            kp, kd, arm, rng = b[3]
            w(
                f'{pad}  <joint name="{name}" type="ball" pos="0 0 0" '
                f'damping="{kd:g}" armature="{arm:g}" limited="false"/>\n'
            )
        else:
            kp, kd, arm, rng = b[3]
            for ax_name, ax in (("x", "1 0 0"), ("y", "0 1 0"), ("z", "0 0 1")):
                w(
                    f'{pad}  <joint name="{name}_{ax_name}" type="hinge" pos="0 0 0" '
                    f'axis="{ax}" stiffness="{kp:g}" damping="{kd:g}" '
                    f'armature="{arm:g}" range="{-rng:g} {rng:g}"/>\n'
                )
        gtype, size, loc, quat, dens = b[4]
        size_s = " ".join(f"{v:.6g}" for v in size)
        if loc[0] == "fromto":
            ft = " ".join(f"{v:.6g}" for v in loc[1])
            w(f'{pad}  <geom type="{gtype}" fromto="{ft}" size="{size_s}" density="{dens:.10g}"/>\n')
        else:
            p = " ".join(f"{v:.6g}" for v in loc[1])
            q = " ".join(f"{v:.6g}" for v in quat)
            w(f'{pad}  <geom type="{gtype}" pos="{p}" quat="{q}" size="{size_s}" density="{dens:.10g}"/>\n')
        for c in children[name]:
            emit(c, indent + 1)
        w(f"{pad}</body>\n")

    emit(names[0], 2)
    w("  </worldbody>\n")
    w("</mujoco>\n")
    return out.getvalue()
