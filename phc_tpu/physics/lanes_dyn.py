"""Batch-in-lanes Pallas kernels for the per-step dynamics build.

Why this exists (measured on v5e, scripts/bench_profile.py r2): the RNEA
bias build dominates the physics cost — ~5.4 ms/substep at B=4096 out of a
~7.8 ms substep — even though it is a few hundred elementwise ops on
(B, J=24) component arrays plus four tiny (24, 24) matmuls. In XLA's
batch-major layout those arrays tile as (8 sublanes, 128 lanes) with only
24 of 128 lanes used (5.3x padding waste), and the op chain fragments
around the einsums/stacks into dozens of HBM round trips. Here the whole
computation is ONE Pallas kernel in the env-minor ("lanes") layout the
Cholesky solver already uses (phc_tpu/physics/solver.py): the batch rides
the 128-lane dimension at zero padding waste, J/N live in sublanes, every
intermediate stays in VMEM, and the ancestor/subtree prefix sums are small
in-VMEM matmuls.

Numerical contract: identical math to `engine._bias_comps` (same component
formulas, same ancestor-mask prefix-sum trick); validated against it and
transitively against MuJoCo's qfrc_bias (tests/test_physics.py,
tests/test_lanes_dyn.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _bias_tables(model):
    """Constant tensors for the lanes kernel, packed into a few inputs:

      bodyc (J, 16):   [m | com(3) | I_body row-major (9) | pad]
      adj   (2, J, J): [ancestor-or-self mask | its transpose]
      sel   (5, N, J): [PB dof->body | GD_x | GD_y | GD_z | EW (cols 0:3)]
      om    (3, J, VP): vel-row -> per-body local joint-omega selection
    """
    J = model.num_bodies
    N = model.num_dofs
    VP = -(-N // 8) * 8

    bodyc = np.zeros((J, 16), np.float32)
    bodyc[:, 0] = model.mass
    bodyc[:, 1:4] = model.com
    bodyc[:, 4:13] = model.inertia.reshape(J, 9)

    anc = model.ancestor_mask.astype(np.float32)
    adj = np.stack([anc, anc.T.copy()])

    dof_body = np.concatenate([[0] * 6, np.repeat(np.arange(1, J), 3)]).astype(np.int64)
    sel = np.zeros((5, N, J), np.float32)
    sel[0, np.arange(N), dof_body] = 1.0  # PB
    for d in range(3):
        sel[1 + d, 3 + d, 0] = 1.0  # root rotation dofs: axis d of body 0
        for j in range(1, J):
            sel[1 + d, 6 + 3 * (j - 1) + d, j] = 1.0  # ball dof (j, d)
        sel[4, d, d] = 1.0  # EW: translation dofs l = e_w

    om = np.zeros((3, J, VP), np.float32)
    for d in range(3):
        for j in range(1, J):
            om[d, j, 6 + 3 * (j - 1) + d] = 1.0

    return bodyc, adj, sel, om, float(model.gravity), J, N, VP


def _make_bias_kernel(J: int, N: int, g: float, with_mass: bool = False, NP: int = 0):
    grav = (0.0, 0.0, g)

    def dot(a, b):
        # HIGHEST precision: these are 0/1 selection / prefix-sum matmuls
        # against VALUE operands — single-pass bf16 (the Mosaic default)
        # rounds the values by ~4e-3 relative, which corrupts the mass
        # matrix by ~0.5 absolute and contact penetrations by millimeters
        # (observed on hardware; interpret mode is exact and hides it).
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(ft_ref, vt_ref, bodyc_ref, adj_ref, sel_ref, om_ref, *rest):
        if with_mass:
            mtab_ref, out_ref, m_ref = rest
        else:
            (out_ref,) = rest
        L = ft_ref.shape[-1]
        ft = ft_ref[:]
        vt = vt_ref[:]
        bodyc = bodyc_ref[:]
        anc, desc = adj_ref[0], adj_ref[1]
        PB = sel_ref[0]
        GD = (sel_ref[1], sel_ref[2], sel_ref[3])
        EW = sel_ref[4]  # (N, J), columns 0:3 hold e_w
        m_c = bodyc[:, 0:1]
        com = bodyc[:, 1:4]
        Ib = bodyc[:, 4:13]

        pos = tuple(ft[i] for i in range(3))  # (J, L)
        qx, qy, qz, qw = ft[3], ft[4], ft[5], ft[6]
        lin = tuple(ft[7 + i] for i in range(3))
        w = tuple(ft[10 + i] for i in range(3))

        # rotation-matrix components (engine._rotmat_comps)
        xx, yy, zz = qx * qx, qy * qy, qz * qz
        xy, xz, yz = qx * qy, qx * qz, qy * qz
        wx, wy, wz = qw * qx, qw * qy, qw * qz
        R = (
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        )

        # world COM + world inertia comps (engine._dyn_params)
        c = tuple(
            pos[r]
            + R[3 * r + 0] * com[:, 0:1]
            + R[3 * r + 1] * com[:, 1:2]
            + R[3 * r + 2] * com[:, 2:3]
            for r in range(3)
        )

        def iw(r, s):
            acc = 0.0
            for p in range(3):
                for q in range(3):
                    acc = acc + R[3 * r + p] * Ib[:, 3 * p + q][:, None] * R[3 * s + q]
            return acc

        Iw = dict(xx=iw(0, 0), xy=iw(0, 1), xz=iw(0, 2), yy=iw(1, 1), yz=iw(1, 2), zz=iw(2, 2))

        # body velocity about the world origin
        wxp = _cross(w, pos)
        v_o = tuple(lin[i] - wxp[i] for i in range(3))

        # joint-rate subspace velocity per body (world)
        om_loc = tuple(dot(om_ref[d], vt) for d in range(3))  # (J, L), zero at root
        sv_ang = tuple(
            R[3 * r + 0] * om_loc[0] + R[3 * r + 1] * om_loc[1] + R[3 * r + 2] * om_loc[2]
            for r in range(3)
        )
        sv_lin = _cross(pos, sv_ang)
        term_aw = _cross(w, sv_ang)
        t1 = _cross(w, sv_lin)
        t2 = _cross(v_o, sv_ang)

        # root term: av[root] = -g + root_sdot (engine._bias_comps:377-391)
        w_root = tuple(w[i][0:1, :] for i in range(3))
        vlin_root = tuple(vt[i : i + 1, :] for i in range(3))
        root_sdot = tuple(-x for x in _cross(w_root, vlin_root))  # 3 x (1, L)
        row0 = (jax.lax.broadcasted_iota(jnp.int32, (J, L), 0) == 0).astype(jnp.float32)
        term_av = tuple(t1[i] + t2[i] + row0 * (root_sdot[i] - grav[i]) for i in range(3))

        # ancestor prefix sums -> bias accelerations
        aw = tuple(dot(anc, term_aw[i]) for i in range(3))
        av = tuple(dot(anc, term_av[i]) for i in range(3))

        # closed-form spatial-inertia products about the world origin
        def I_apply(wc, vc):
            iww = (
                Iw["xx"] * wc[0] + Iw["xy"] * wc[1] + Iw["xz"] * wc[2],
                Iw["xy"] * wc[0] + Iw["yy"] * wc[1] + Iw["yz"] * wc[2],
                Iw["xz"] * wc[0] + Iw["yz"] * wc[1] + Iw["zz"] * wc[2],
            )
            wxc = _cross(wc, c)
            inner = tuple(wxc[i] + vc[i] for i in range(3))
            cxi = _cross(c, inner)
            n = tuple(iww[i] + m_c * cxi[i] for i in range(3))
            f = tuple(m_c * inner[i] for i in range(3))
            return n, f

        n_v, f_v = I_apply(w, v_o)
        n_a, f_a = I_apply(aw, av)
        wxn = _cross(w, n_v)
        vxf = _cross(v_o, f_v)
        wxf = _cross(w, f_v)
        fb_top = tuple(n_a[i] + wxn[i] + vxf[i] for i in range(3))
        fb_bot = tuple(f_a[i] + wxf[i] for i in range(3))

        # subtree wrench sums, gathered to dof rows
        Xs = tuple(dot(desc, x) for x in (*fb_top, *fb_bot))  # 6 x (J, L)
        XsD = tuple(dot(PB, x) for x in Xs)  # 6 x (N, L)

        # motion subspace (engine._motion_subspace_comps) on dof rows
        a_c = tuple(
            dot(GD[0], R[3 * w_ + 0]) + dot(GD[1], R[3 * w_ + 1]) + dot(GD[2], R[3 * w_ + 2])
            for w_ in range(3)
        )
        x_c = tuple(dot(PB, pos[i]) for i in range(3))
        l_c = _cross(x_c, a_c)
        l_c = tuple(l_c[i] + EW[:, i][:, None] for i in range(3))

        Sc = (*a_c, *l_c)
        tau = Sc[0] * XsD[0]
        for i in range(1, 6):
            tau = tau + Sc[i] * XsD[i]

        pad_rows = out_ref.shape[0] - N
        if pad_rows:
            tau = jnp.concatenate([tau, jnp.zeros((pad_rows, L), tau.dtype)], axis=0)
        out_ref[:] = tau

        if not with_mass:
            return

        # ---- CRBA mass matrix + implicit-damping diagonal, emitted in the
        # factor kernel's lanes layout (engine._mass_matrix_comps, fused) --
        # subtree sums of h = m c and G = I_com + m(|c|^2 I - c c^T)
        h = tuple(m_c * c[i] for i in range(3))
        c2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
        Gc = (
            Iw["xx"] + m_c * (c2 - c[0] * c[0]),
            Iw["xy"] - m_c * c[0] * c[1],
            Iw["xz"] - m_c * c[0] * c[2],
            Iw["yy"] + m_c * (c2 - c[1] * c[1]),
            Iw["yz"] - m_c * c[1] * c[2],
            Iw["zz"] + m_c * (c2 - c[2] * c[2]),
        )
        h_sub = tuple(dot(desc, h[i]) for i in range(3))
        G_sub = tuple(dot(desc, Gc[i]) for i in range(6))
        # gather to dof rows
        hd = tuple(dot(PB, h_sub[i]) for i in range(3))
        Gd = tuple(dot(PB, G_sub[i]) for i in range(6))
        Gxx, Gxy, Gxz, Gyy, Gyz, Gzz = Gd
        m_row = mtab_ref[3][0:N, 0:1]  # (N, 1) subtree mass per dof row

        a3 = (Sc[0], Sc[1], Sc[2])
        l3 = (Sc[3], Sc[4], Sc[5])
        hxl = _cross(hd, l3)
        F_top = (
            Gxx * a3[0] + Gxy * a3[1] + Gxz * a3[2] + hxl[0],
            Gxy * a3[0] + Gyy * a3[1] + Gyz * a3[2] + hxl[1],
            Gxz * a3[0] + Gyz * a3[1] + Gzz * a3[2] + hxl[2],
        )
        axh = _cross(a3, hd)
        F_bot = tuple(axh[i] + m_row * l3[i] for i in range(3))
        F6 = (*F_top, *F_bot)

        zpad = jnp.zeros((NP - N, L), jnp.float32)
        F6p = tuple(jnp.concatenate([F6[i], zpad], axis=0) for i in range(6))
        Scp = tuple(jnp.concatenate([Sc[i], zpad], axis=0) for i in range(6))

        # M = (F (x) S) on ancestor-or-self pairs (incl. diagonal) plus the
        # strict-upper side from the symmetric transpose (computed with
        # swapped operand roles — no in-VMEM transpose), plus the constant
        # diagonal (armature + dt*kd + identity on pad rows). Row-chunked
        # so temporaries stay ~0.7 MB.
        anc_m = mtab_ref[0]  # (NP, NP) ancestor-or-self (lower + diag)
        lowT = mtab_ref[1]  # strict upper mask (lower transposed)
        Dc = mtab_ref[2]  # constant diagonal matrix
        CH = 8
        for r in range(0, NP, CH):
            Mlow = sum(
                jnp.expand_dims(F6p[i][r : r + CH], 1) * jnp.expand_dims(Scp[i], 0)
                for i in range(6)
            )  # (CH, NP, L)
            MlowT = sum(
                jnp.expand_dims(Scp[i][r : r + CH], 1) * jnp.expand_dims(F6p[i], 0)
                for i in range(6)
            )
            m_ref[r : r + CH] = (
                Mlow * jnp.expand_dims(anc_m[r : r + CH], 2)
                + MlowT * jnp.expand_dims(lowT[r : r + CH], 2)
                + jnp.expand_dims(Dc[r : r + CH], 2)
            )

    return kernel


def _mass_tables(model, NP: int):
    """(4, NP, NP) constants for the fused mass build: [ancestor-or-self
    pair mask (lower+diag) | strict-upper mask | constant diagonal matrix
    (armature + dt*kd, identity on pad rows) | row 0 = subtree mass per
    dof row]."""
    J = model.num_bodies
    N = model.num_dofs
    dof_body = np.concatenate([[0] * 6, np.repeat(np.arange(1, J), 3)]).astype(np.int64)
    anc = model.ancestor_mask[np.ix_(dof_body, dof_body)]  # (N, N)
    eye = np.eye(N, dtype=bool)
    lower = anc & ~eye
    mtab = np.zeros((4, NP, NP), np.float32)
    # DISJOINT masks for the additive symmetrization (same-body dof pairs
    # — the root 6x6 and each ball joint's 3x3 block — are ancestor-or-
    # self BOTH ways; engine's select-based masking resolves them to the
    # transposed value, so the direct mask must exclude them)
    mtab[0, :N, :N] = ((lower & ~lower.T) | eye).astype(np.float32)
    mtab[1, :N, :N] = lower.T.astype(np.float32)
    arm = np.concatenate([np.zeros(6, np.float32), model.armature])
    kd_full = np.concatenate([np.zeros(6, np.float32), model.kd])
    diag = arm + model.dt * kd_full
    mtab[2, :N, :N] = np.diag(diag.astype(np.float32))
    for i in range(N, NP):
        mtab[2, i, i] = 1.0  # identity pad rows (factor-safe)
    m_sub = (model.ancestor_mask.T.astype(np.float64) @ model.mass).astype(np.float32)
    mtab[3, :N, 0] = m_sub[dof_body]  # COLUMN: reads as (N, 1) w/o gather
    return mtab


def mass_bias_lanes(model, frame, state, interpret: bool | None = None):
    """One kernel emitting BOTH the RNEA bias (NP, Bp lanes layout) and the
    implicit-system partial LHS M + diag(armature + dt*kd) in the Cholesky
    factor's (NP, NP, Bp) lanes layout with identity pad diagonal — the
    fused frozen path adds the contact Gram and factors in-kernel, so no
    whole-array pad/transpose pass ever touches the mass matrix."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _auto_interpret(interpret)
    bodyc, adj, sel, om, g, J, N, VP = _bias_tables(model)
    B = frame.rot.shape[0]
    LANES = 128
    Bp = -(-B // LANES) * LANES
    NP = -(-N // 8) * 8
    mtab = _mass_tables(model, NP)

    ft = jnp.concatenate(
        [frame.pos, frame.rot, frame.lin_vel, frame.ang_vel], axis=-1
    ).transpose(2, 1, 0)  # (13, J, B)
    vt = state.vel.T  # (N, B)
    if VP != N:
        vt = jnp.pad(vt, ((0, VP - N), (0, 0)))
    if Bp != B:
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, Bp - B)))
        vt = jnp.pad(vt, ((0, 0), (0, Bp - B)))

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    C_l, M_l = pl.pallas_call(
        _make_bias_kernel(J, N, g, with_mass=True, NP=NP),
        out_shape=(
            jax.ShapeDtypeStruct((NP, Bp), jnp.float32),
            jax.ShapeDtypeStruct((NP, NP, Bp), jnp.float32),
        ),
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((13, J, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((VP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            const_spec(bodyc.shape),
            const_spec(adj.shape),
            const_spec(sel.shape),
            const_spec(om.shape),
            const_spec(mtab.shape),
        ],
        out_specs=(
            pl.BlockSpec((NP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, NP, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        ft, vt, jnp.asarray(bodyc), jnp.asarray(adj), jnp.asarray(sel),
        jnp.asarray(om), jnp.asarray(mtab),
    )
    return C_l[:, :B], M_l[:, :, :B]


def bias_forces_lanes(model, frame, state, interpret: bool | None = None) -> jax.Array:
    """RNEA bias forces (Coriolis/centrifugal + gravity), (B, N) — the
    fused lanes-kernel replacement for `engine._bias_comps`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _auto_interpret(interpret)
    bodyc, adj, sel, om, g, J, N, VP = _bias_tables(model)
    B = frame.rot.shape[0]
    LANES = 128
    Bp = -(-B // LANES) * LANES

    ft = jnp.concatenate(
        [frame.pos, frame.rot, frame.lin_vel, frame.ang_vel], axis=-1
    ).transpose(2, 1, 0)  # (13, J, B)
    vt = state.vel.T  # (N, B)
    if VP != N:
        vt = jnp.pad(vt, ((0, VP - N), (0, 0)))
    if Bp != B:
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, Bp - B)))
        vt = jnp.pad(vt, ((0, 0), (0, Bp - B)))

    NP = -(-N // 8) * 8
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_bias_kernel(J, N, g),
        out_shape=jax.ShapeDtypeStruct((NP, Bp), jnp.float32),
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((13, J, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((VP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            const_spec(bodyc.shape),
            const_spec(adj.shape),
            const_spec(sel.shape),
            const_spec(om.shape),
        ],
        out_specs=pl.BlockSpec((NP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ft, vt, jnp.asarray(bodyc), jnp.asarray(adj), jnp.asarray(sel), jnp.asarray(om))
    return out[:N, :B].T


# ---------------------------------------------------------------------------
# Narrow-phase lanes kernel: all C contact candidates' geometry in one
# kernel (capsule-capsule closest points, penetration, contact frame,
# relative velocities). Replaces ~15 small XLA fusions + the feature-stack
# concatenate on the (B, C) component chain (~1 ms/ctrl-step traced).
# ---------------------------------------------------------------------------

def _narrow_tables(model):
    from phc_tpu.physics.engine import _candidate_tables_v2
    from phc_tpu.physics.model import derived_cache

    cache = derived_cache(model)
    hit = cache.get("narrow_tables")
    if hit is not None:
        return hit

    tab = _candidate_tables_v2(model)
    J = model.num_bodies
    C = tab["body_a"].shape[0]
    CP = -(-C // 8) * 8
    oh = np.zeros((2, CP, J), np.float32)
    oh[0, np.arange(C), tab["body_a"]] = 1.0
    oh[1, np.arange(C), np.maximum(tab["body_b"], 0)] = 1.0
    knt = np.zeros((CP, 16), np.float32)
    knt[:C, 0:3] = tab["seg_a0"]
    knt[:C, 3:6] = tab["seg_a1"]
    knt[:C, 6:9] = tab["seg_b0"]
    knt[:C, 9:12] = tab["seg_b1"]
    knt[:C, 12] = tab["rad_a"]
    knt[:C, 13] = tab["rad_b"]
    knt[:C, 14] = tab["is_ground"]
    # per-candidate [body_a, body_b0, is_ground] triple (bstat column
    # order of engine's tables) — consumed by the in-kernel top-k
    # compaction; pad rows get body id -1 like engine's padded slots
    bst = np.full((CP, 8), -1.0, np.float32)
    bst[:C, 0] = tab["body_a"].astype(np.float32)
    bst[:C, 1] = np.maximum(tab["body_b"], 0).astype(np.float32)
    bst[:C, 2] = tab["is_ground"]
    out = (oh, knt, bst, J, C, CP)
    cache["narrow_tables"] = out
    return out


def _narrow_geometry(ft, OHa, OHb, knt_ref):
    """Shared narrow-phase geometry on lanes-layout values: from packed
    frame rows (13, J, L) to per-candidate penetration + 12 features
    (each (CP, L)). Used by both the plain kernel (writes everything out)
    and the fused top-k kernel (compacts in VMEM first)."""

    def dot(a, b):
        # HIGHEST precision: these are 0/1 selection / prefix-sum matmuls
        # against VALUE operands — single-pass bf16 (the Mosaic default)
        # rounds the values by ~4e-3 relative, which corrupts the mass
        # matrix by ~0.5 absolute and contact penetrations by millimeters
        # (observed on hardware; interpret mode is exact and hides it).
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    if True:  # keep the original kernel body's indentation
        pos = tuple(ft[i] for i in range(3))  # (J, L)
        qx, qy, qz, qw = ft[3], ft[4], ft[5], ft[6]
        lin = tuple(ft[7 + i] for i in range(3))
        ang = tuple(ft[10 + i] for i in range(3))

        xx, yy, zz = qx * qx, qy * qy, qz * qz
        xy, xz, yz = qx * qy, qx * qz, qy * qz
        wx, wy, wz = qw * qx, qw * qy, qw * qz
        R = (
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        )

        # per-candidate gathers through static one-hot matmuls (MXU)
        Ra = tuple(dot(OHa, R[i]) for i in range(9))
        Rb = tuple(dot(OHb, R[i]) for i in range(9))
        pa = tuple(dot(OHa, pos[i]) for i in range(3))
        pb = tuple(dot(OHb, pos[i]) for i in range(3))
        va = tuple(dot(OHa, lin[i]) for i in range(3))
        vb = tuple(dot(OHb, lin[i]) for i in range(3))
        wa = tuple(dot(OHa, ang[i]) for i in range(3))
        wb = tuple(dot(OHb, ang[i]) for i in range(3))

        def kc(i):  # per-candidate constant column (CP, 1)
            return knt_ref[:, i : i + 1]

        def world(Rc, pc, base):
            sx, sy, sz = kc(base), kc(base + 1), kc(base + 2)
            return tuple(
                Rc[3 * r + 0] * sx + Rc[3 * r + 1] * sy + Rc[3 * r + 2] * sz + pc[r]
                for r in range(3)
            )

        a0 = world(Ra, pa, 0)
        a1 = world(Ra, pa, 3)
        b0 = world(Rb, pb, 6)
        b1 = world(Rb, pb, 9)

        # closest points between segments (engine._seg_st_soa, branch-free)
        eps = 1e-9
        d1 = tuple(a1[i] - a0[i] for i in range(3))
        d2 = tuple(b1[i] - b0[i] for i in range(3))
        r3_ = tuple(a0[i] - b0[i] for i in range(3))

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        a_ = dot3(d1, d1)
        e_ = dot3(d2, d2)
        f_ = dot3(d2, r3_)
        c_ = dot3(d1, r3_)
        b_ = dot3(d1, d2)
        a_ok = a_ > eps
        e_ok = e_ > eps
        a_safe = jnp.where(a_ok, a_, 1.0)
        e_safe = jnp.where(e_ok, e_, 1.0)
        denom = a_ * e_ - b_ * b_
        s0 = jnp.where(
            denom > eps,
            jnp.clip((b_ * f_ - c_ * e_) / jnp.where(denom > eps, denom, 1.0), 0.0, 1.0),
            0.0,
        )
        t0 = jnp.clip((b_ * s0 + f_) / e_safe, 0.0, 1.0)
        s_gen = jnp.clip((b_ * t0 - c_) / a_safe, 0.0, 1.0)
        s = jnp.where(a_ok & e_ok, s_gen, jnp.where(a_ok, jnp.clip(-c_ / a_safe, 0.0, 1.0), 0.0))
        t = jnp.where(a_ok & e_ok, t0, jnp.where(e_ok, jnp.clip(f_ / e_safe, 0.0, 1.0), 0.0))

        cp1 = tuple(a0[i] + s * d1[i] for i in range(3))
        cp2 = tuple(b0[i] + t * d2[i] for i in range(3))
        diff = tuple(cp1[i] - cp2[i] for i in range(3))
        dist = jnp.sqrt(jnp.maximum(dot3(diff, diff), 1e-12))

        rad_a = kc(12)
        rad_b = kc(13)
        is_g = kc(14)
        is_pair = 1.0 - is_g

        pen_ground = rad_a - a0[2]
        pen_pair = rad_a + rad_b - dist
        pen_all = jnp.where(is_g > 0.5, pen_ground, pen_pair)

        inv_d = 1.0 / jnp.maximum(dist, 1e-6)
        valid = (dist > 1e-6) & jnp.broadcast_to(is_g < 0.5, dist.shape)
        nx = jnp.where(valid, diff[0] * inv_d, 0.0)
        ny = jnp.where(valid, diff[1] * inv_d, 0.0)
        nz = jnp.where(valid, diff[2] * inv_d, 1.0)
        n = (nx, ny, nz)

        x_a = tuple(jnp.where(is_g > 0.5, a0[i], cp1[i] - rad_a * n[i]) for i in range(3))
        x_b = tuple((cp2[i] + rad_b * n[i]) * is_pair for i in range(3))

        def cross(a, b):
            return (
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            )

        ra_arm = tuple(x_a[i] - pa[i] for i in range(3))
        rb_arm = tuple(x_b[i] - pb[i] for i in range(3))
        ca = cross(wa, ra_arm)
        cb = cross(wb, rb_arm)
        v_rel = tuple(va[i] + ca[i] - (vb[i] + cb[i]) * is_pair for i in range(3))

        # tangent basis (engine._tangent_basis_soa)
        sgn = jnp.where(nz >= 0.0, 1.0, -1.0)
        a_tb = -1.0 / (sgn + nz)
        b_tb = nx * ny * a_tb
        t1 = (1.0 + sgn * nx * nx * a_tb, sgn * b_tb, -sgn * nx)
        t2 = (b_tb, sgn + ny * ny * a_tb, -ny)
        v_t1 = dot3(v_rel, t1)
        v_t2 = dot3(v_rel, t2)
        v_n = dot3(v_rel, n)

    return pen_all, (*x_a, *x_b, *n, v_t1, v_t2, v_n)


def _make_narrow_kernel(J: int, C: int, CP: int):
    def kernel(ft_ref, oh_ref, knt_ref, pen_ref, feat_ref):
        pen_all, feats = _narrow_geometry(ft_ref[:], oh_ref[0], oh_ref[1], knt_ref)
        pen_ref[:] = pen_all
        for i, arr in enumerate(feats):
            feat_ref[i] = arr

    return kernel


def _make_narrow_topk_kernel(J: int, C: int, CP: int, A: int, packed: bool):
    """Narrow phase + in-VMEM top-A compaction in ONE kernel.

    Replaces the XLA chain [full (B, C) sort -> pred one-hot build ->
    relayout copies -> three selection einsums -> (12, C, B) feature
    materialization] (~1.2 ms/ctrl step traced on v5e) with A sequential
    masked argmax extractions over the (CP, L) candidate block already
    sitting in VMEM. Selection order and tie-breaks match jax.lax.top_k
    exactly (descending penetration, lowest candidate index on ties), so
    the compaction semantics are bit-identical to the engine's oracle
    path.

    packed=True (the hardware path): the extraction's per-pass cost is
    reductions over the 320-row candidate axis, so the 12 features are
    bf16-truncated and bit-packed in PAIRS into int32 rows (6 sums
    instead of 12) and the three body-id columns into one small-integer
    row (1 sum instead of 3) — 9 reductions/pass instead of 17. The sums
    run in INTEGER (exact; float sums would flush packed denormals, e.g.
    ground contacts' exactly-zero x_b). bf16 feature precision equals
    what the pre-r5 XLA path's bf16 selection matmul already applied,
    and hardware behavior is re-validated by the trained-policy eval
    probe. packed=False (interpret/CPU) keeps f32 features end-to-end
    and is what the oracle-parity test pins.
    """

    def kernel(ft_ref, oh_ref, knt_ref, bst_ref, pen_ref, feat_ref, bsel_ref):
        pen_all, feats = _narrow_geometry(ft_ref[:], oh_ref[0], oh_ref[1], knt_ref)
        L = pen_all.shape[-1]
        # Mosaic iota must be integer-typed; compare/select in f32
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (CP, L), 0).astype(jnp.float32)
        # candidate-pad rows (c >= C) carry garbage geometry — never select
        avail = jnp.where(iota_c < float(C), 1.0, 0.0)
        BIG = jnp.float32(1e30)

        if packed:
            # 6 int32 rows: [bf16(f[2j]) bits | bf16(f[2j+1]) bits]
            def hi16(x):
                return jax.lax.bitcast_convert_type(x, jnp.int32) & jnp.int32(-65536)

            pk = [
                hi16(feats[2 * j])
                | jax.lax.shift_right_logical(
                    jax.lax.bitcast_convert_type(feats[2 * j + 1], jnp.int32)
                    & jnp.int32(-65536),
                    jnp.int32(16),
                )
                for j in range(6)
            ]
            # small exact ints: body_a + 32*body_b0 + 1024*is_ground
            cmb = (
                bst_ref[:, 0:1] + 32.0 * bst_ref[:, 1:2] + 1024.0 * bst_ref[:, 2:3]
            ).astype(jnp.int32) + jnp.zeros((CP, L), jnp.int32)
            rows = pk + [cmb]  # 7 int32 (CP, L) rows
            for a in range(A):
                v = jnp.where(avail > 0.5, pen_all, -BIG)
                mx = jnp.max(v, axis=0, keepdims=True)
                idxv = jnp.where(v == mx, iota_c, jnp.float32(CP))
                am = jnp.min(idxv, axis=0, keepdims=True)
                oh1 = iota_c == am
                avail = avail - jnp.where(oh1, 1.0, 0.0)
                pen_ref[a : a + 1, :] = mx
                for r in range(7):
                    feat_ref[r, a : a + 1, :] = jnp.sum(
                        jnp.where(oh1, rows[r], 0), axis=0, keepdims=True
                    )
            bsel_ref[:] = jnp.zeros_like(bsel_ref)  # unused in packed layout
            return

        bcols = tuple(bst_ref[:, s : s + 1] for s in range(3))  # (CP, 1)
        for a in range(A):
            v = jnp.where(avail > 0.5, pen_all, -BIG)
            mx = jnp.max(v, axis=0, keepdims=True)  # (1, L)
            # first-index tie-break (== lax.top_k's stable order)
            idxv = jnp.where(v == mx, iota_c, jnp.float32(CP))
            am = jnp.min(idxv, axis=0, keepdims=True)  # (1, L)
            ohf = jnp.where(iota_c == am, 1.0, 0.0)  # exact one-hot (CP, L)
            avail = avail - ohf
            pen_ref[a : a + 1, :] = mx
            for f in range(12):
                feat_ref[f, a : a + 1, :] = jnp.sum(
                    feats[f] * ohf, axis=0, keepdims=True
                )
            for s in range(3):
                bsel_ref[s, a : a + 1, :] = jnp.sum(
                    bcols[s] * ohf, axis=0, keepdims=True
                )

    return kernel


def narrow_phase_topk_lanes(model, frame, A: int, interpret: bool | None = None):
    """Fused narrow phase + top-A compaction. Returns batch-major
    (pen_sel (B, A), fsel (B, A, 12), bsel (B, A, 3)) matching what
    engine._compact_contacts computes from top_k + one-hot selection
    (feature order x_a, x_b, n, v_t1, v_t2, v_n; bsel columns
    [body_a, body_b0, is_ground])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _auto_interpret(interpret)
    oh, knt, bst, J, C, CP = _narrow_tables(model)
    B = frame.rot.shape[0]
    LANES = 128
    Bp = -(-B // LANES) * LANES
    packed = not interpret  # hardware: packed rows; interpret/CPU: f32 oracle

    ft = jnp.concatenate(
        [frame.pos, frame.rot, frame.lin_vel, frame.ang_vel], axis=-1
    ).transpose(2, 1, 0)  # (13, J, B)
    if Bp != B:
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, Bp - B)))

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    if packed:
        out_shape = (
            jax.ShapeDtypeStruct((A, Bp), jnp.float32),
            jax.ShapeDtypeStruct((7, A, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, A, Bp), jnp.float32),  # unused slot
        )
        out_specs = (
            pl.BlockSpec((A, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, A, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        )
    else:
        out_shape = (
            jax.ShapeDtypeStruct((A, Bp), jnp.float32),
            jax.ShapeDtypeStruct((12, A, Bp), jnp.float32),
            jax.ShapeDtypeStruct((3, A, Bp), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((A, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, A, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, A, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        )
    pen_l, feat_l, bsel_l = pl.pallas_call(
        _make_narrow_topk_kernel(J, C, CP, A, packed),
        out_shape=out_shape,
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((13, J, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            const_spec(oh.shape),
            const_spec(knt.shape),
            const_spec(bst.shape),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(ft, jnp.asarray(oh), jnp.asarray(knt), jnp.asarray(bst))
    pen_sel = pen_l[:, :B].T  # (B, A)
    if packed:
        pk = feat_l[:6, :, :B].transpose(2, 1, 0)  # (B, A, 6) int32
        hi = jax.lax.bitcast_convert_type(pk & jnp.int32(-65536), jnp.float32)
        lo = jax.lax.bitcast_convert_type(
            jax.lax.shift_left(pk, jnp.int32(16)), jnp.float32
        )
        fsel = jnp.stack(
            [hi[..., 0], lo[..., 0], hi[..., 1], lo[..., 1], hi[..., 2], lo[..., 2],
             hi[..., 3], lo[..., 3], hi[..., 4], lo[..., 4], hi[..., 5], lo[..., 5]],
            axis=-1,
        )  # (B, A, 12)
        cmb = feat_l[6, :, :B].T  # (B, A) int32
        b0 = (cmb % 32).astype(jnp.float32)
        b1 = ((cmb // 32) % 32).astype(jnp.float32)
        bg = (cmb // 1024).astype(jnp.float32)
        bsel = jnp.stack([b0, b1, bg], axis=-1)  # (B, A, 3)
        return pen_sel, fsel, bsel
    fsel = feat_l[:, :, :B].transpose(2, 1, 0)  # (B, A, 12)
    bsel = bsel_l[:, :, :B].transpose(2, 1, 0)  # (B, A, 3)
    return pen_sel, fsel, bsel


def narrow_phase_lanes(model, frame, interpret: bool | None = None):
    """All-candidate contact geometry in one lanes kernel. Returns
    (pen_all (B, C), feats (B, 12, C)) matching engine._contact_system's
    phase 1 (feature order: x_a, x_b, n, v_t1, v_t2, v_n)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _auto_interpret(interpret)
    oh, knt, _bst, J, C, CP = _narrow_tables(model)
    B = frame.rot.shape[0]
    LANES = 128
    Bp = -(-B // LANES) * LANES

    ft = jnp.concatenate(
        [frame.pos, frame.rot, frame.lin_vel, frame.ang_vel], axis=-1
    ).transpose(2, 1, 0)  # (13, J, B)
    if Bp != B:
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, Bp - B)))

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    pen_l, feat_l = pl.pallas_call(
        _make_narrow_kernel(J, C, CP),
        out_shape=(
            jax.ShapeDtypeStruct((CP, Bp), jnp.float32),
            jax.ShapeDtypeStruct((12, CP, Bp), jnp.float32),
        ),
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((13, J, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            const_spec(oh.shape),
            const_spec(knt.shape),
        ],
        out_specs=(
            pl.BlockSpec((CP, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, CP, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ft, jnp.asarray(oh), jnp.asarray(knt))
    pen_all = pen_l[:C, :B].T  # (B, C)
    feats = feat_l[:, :C, :B].transpose(2, 0, 1)  # (B, 12, C)
    return pen_all, feats
