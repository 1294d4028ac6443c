"""Whole-substep fused Pallas kernel for the frozen physics step.

Why (PERF.md r3 knockout finding): the frozen control step costs ~8.9 ms at
B=4096 on the tunneled v5e REGARDLESS of how much compute is knocked out —
it is the sequential dependency chain of hundreds of tiny XLA kernels
(PD exp-maps, contact RHS stages, triangular substitutions, quaternion
integrations), each paying fixed dispatch/HBM-turnaround latency. The
longest strictly-sequential stretch is the substep loop: `substeps`
iterations of PD -> contact RHS -> Cholesky resolve -> velocity/pose
integration, ~40 kernels of latency that no amount of FLOP removal hides.

This module fuses ALL substep iterations of one control step into ONE
Pallas kernel in the env-minor ("lanes") layout the factor kernel already
uses (phc_tpu/physics/solver.py): the batch rides the 128-lane dimension,
matrix/vector dims live in sublanes, and every intermediate — including
both triangular substitutions per substep — stays in VMEM. The factored
LHS (from chol_factor_lanes) and the contact Jacobian are each read from
HBM once per control step instead of 2-4 times.

Numerical contract: identical math to the substep loop in
`engine._step_frozen` (stable-PD torque from the integrated pose, explicit
contact forces against frozen coefficients, first-order contact-state
updates, exp-map quaternion integration — reference behavior anchors:
`/root/reference/puffer_phc/envs/isaacgym_env.py:39-41` substep structure,
`humanoid_phc.py:127-128` PD actuation). The contact matvecs run in fp32
here (the XLA path used one-pass bf16 MXU for them); tests pin fused vs
legacy agreement on CPU where both are fp32 (tests/test_fused_step.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _substep_tables(model):
    """Constant tensors for the fused substep kernel:

    cst (4, NP): [kp row | kd row | pad | pad] aligned to vel/dof rows
                 (rows 6..N-1 carry the 69 actuated gains, rest zero)
    om  (3, J, NP): per-axis body<-vel-row selection; row 0 maps the root
                 body to vel[3+d] (body-frame root angular velocity), row
                 j>=1 maps ball joint j to vel[6+3(j-1)+d]
    omT (3, NP, J): transpose — scatters per-body exp-map components back
                 to dof rows (root rows 0..5 stay zero)
    """
    from phc_tpu.physics.model import derived_cache

    cache = derived_cache(model)
    hit = cache.get("substep_tables")
    if hit is not None:
        return hit
    J = model.num_bodies
    N = model.num_dofs
    NP = -(-N // 8) * 8

    cst = np.zeros((4, NP), np.float32)
    cst[0, 6:N] = model.kp
    cst[1, 6:N] = model.kd

    om = np.zeros((3, J, NP), np.float32)
    omT = np.zeros((3, NP, J), np.float32)
    for d in range(3):
        om[d, 0, 3 + d] = 1.0  # root angular velocity (body frame)
        for j in range(1, J):
            om[d, j, 6 + 3 * (j - 1) + d] = 1.0
            omT[d, 6 + 3 * (j - 1) + d, j] = 1.0  # exp-map -> dof rows only

    out = (cst, om, omT, J, N, NP)
    cache["substep_tables"] = out
    return out


def _make_substep_kernel(
    J: int, N: int, NP: int, A: int, MP: int,
    dt: float, substeps: int, k: float, d: float,
    pen_cap: float, max_vel: float,
):
    """Kernel body: all `substeps` velocity iterations of one control step.

    Ref layouts per 128-lane tile (env minor everywhere):
      cst (4, NP) const           om/omT (3, J, NP)/(3, NP, J) const
      Lt (NP, NP, L)  factored LHS (chol_factor_lanes layout, col-major)
      Jm (NP, MP, L)  contact Jacobian rows (cols 0:3A valid, t1|t2|n)
      C  (NP, L)      RNEA bias   cc (MP, L) implicit coefficient per row
      pen0 (MP, L)    signed penetration embedded in the n-section rows
      vm0 (MP, L)     initial contact-frame relative velocity
      pd (NP, L)      PD targets scattered to dof rows
      qc (4, J, L)    joint quaternions, component-major (x,y,z,w)
      rp (8, L)       root position rows 0:3
      vel (NP, L)     generalized velocity
      qe (NP, L)      external generalized force (zeros when unused)
    Outputs: qc', rp', vel', tq (dof torque rows), fm (final contact
    forces per contact-frame row, for the XLA-side per-body aggregation).
    """
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

    def acos(x):
        """fp32 arccos via the Cephes asinf polynomial (~1 ulp): Mosaic has
        no acos lowering. asin(|x|) = poly for |x|<=0.5, else
        pi/2 - 2*asin(sqrt((1-|x|)/2)); acos(x) = pi/2 - sign(x)*asin(|x|)."""
        ax = jnp.abs(x)
        big = ax > 0.5
        w = jnp.where(big, 0.5 * (1.0 - ax), ax * ax)
        s = jnp.where(big, jnp.sqrt(w), ax)
        r = (
            (((4.2163199048e-2 * w + 2.4181311049e-2) * w + 4.5470025998e-2) * w
             + 7.4953002686e-2) * w + 1.6666752422e-1
        )
        asin_s = s + s * w * r
        asin_ax = jnp.where(big, 0.5 * np.pi - 2.0 * asin_s, asin_s)
        return 0.5 * np.pi - jnp.where(x < 0.0, -asin_ax, asin_ax)

    M3 = 3 * A

    def kernel(
        cst_ref, om_ref, omT_ref,
        lhs_hbm, Jm_hbm, C_ref, cc_ref, pen0_ref, vm0_ref,
        pd_ref, qc_ref, rp_ref, vel_ref, qe_ref,
        qc_out, rp_out, vel_out, tq_out, fm_out,
        vm_scr, pen_scr, y_scr, y2_scr, x_scr,
        lt_scr, jm_scr, dma_sem,
    ):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        L = vel_ref.shape[-1]
        KP = jnp.expand_dims(cst_ref[0], 1)  # (NP, 1)
        KD = jnp.expand_dims(cst_ref[1], 1)
        # rows of the normal section (2A:3A) of the contact-frame arrays
        m_row = jax.lax.broadcasted_iota(jnp.int32, (MP, 1), 0)
        n_mask = ((m_row >= 2 * A) & (m_row < 3 * A)).astype(jnp.float32)

        # The two large per-env matrices (LHS + contact Jacobian, ~8.5 MB/
        # tile together) are DMA'd manually: auto-blocked inputs would be
        # double-buffered by the pipeline and blow the 16 MB VMEM budget.
        # Jm arrives UNPADDED (N, 3A, B) — the pad ring of the VMEM tile is
        # zeroed here instead of paying a whole-array XLA pad pass in HBM.
        # Start both copies first, wait as late as possible so the PD
        # prologue overlaps the transfer.
        i = pl.program_id(0)
        cp_l = pltpu.make_async_copy(
            lhs_hbm.at[:, :, pl.ds(i * L, L)], lt_scr, dma_sem.at[0]
        )
        cp_j = pltpu.make_async_copy(
            Jm_hbm.at[:, :, pl.ds(i * L, L)], jm_scr, dma_sem.at[1]
        )
        cp_l.start()
        cp_j.start()

        Cb = C_ref[:]
        cc = cc_ref[:]
        pd = pd_ref[:]
        qe = qe_ref[:]

        # working state lives in the output refs
        qc_out[:] = qc_ref[:]
        rp_out[:] = rp_ref[:]
        vel_out[:] = vel_ref[:]
        vm_scr[:] = vm0_ref[:]
        pen_scr[:] = pen0_ref[:]

        # ---- Cholesky-factor the LHS in place (solver.
        # _chol_factor_lanes_kernel): fusing the factorization here removes
        # the separate factor kernel's HBM round trip of the factor
        # (2 x 107 MB at B=4096) plus its launch/pipeline cost.
        cp_l.wait()
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, L), 0)
        for j in range(NP):
            colj = lt_scr[j]
            dinv = jax.lax.rsqrt(jnp.maximum(colj[j : j + 1, :], 1e-12))
            Lj = jnp.where(row_ids >= j, colj * dinv, 0.0)
            lt_scr[j] = Lj
            if j + 1 < NP:
                scale = Lj[j + 1 :, :]
                lt_scr[j + 1 :] = lt_scr[j + 1 :] - Lj[None, :, :] * scale[:, None, :]

        cp_j.wait()

        tau = None
        x = None
        for it in range(substeps):
            # ---- stable-PD torque from the CURRENT integrated pose --------
            # exp map of each ball-joint quaternion (quat_to_angle_axis +
            # angle_axis_to_exp_map, transforms.py:119-156)
            qx, qy, qz, qw = qc_out[0], qc_out[1], qc_out[2], qc_out[3]  # (J, L)
            qw_c = jnp.clip(qw, -1.0, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - qw_c * qw_c, 0.0))
            # normalize_angle(2*acos(qw)): 2*acos is in [0, 2pi], so the
            # atan2 wrap reduces to one conditional 2pi subtraction
            two_ac = 2.0 * acos(qw_c)
            ang = jnp.where(two_ac > np.pi, two_ac - 2.0 * np.pi, two_ac)
            inv_s = 1.0 / jnp.maximum(sin_t, 1e-12)
            mask = sin_t > 1e-5
            ang = jnp.where(mask, ang, 0.0)
            ex = ang * jnp.where(mask, qx * inv_s, 0.0)
            ey = ang * jnp.where(mask, qy * inv_s, 0.0)
            ez = ang * jnp.where(mask, qz * inv_s, 1.0)  # default axis z
            # scatter exp-map components to dof rows (root rows stay 0)
            q_row = dot(omT_ref[0], ex) + dot(omT_ref[1], ey) + dot(omT_ref[2], ez)

            vel = vel_out[:]
            tau = KP * (pd - q_row - dt * vel) - KD * vel  # zero on root rows

            # ---- explicit contact force against frozen coefficients -------
            vm = vm_scr[:]
            pen = pen_scr[:]
            active = (pen > 0.0).astype(pen.dtype)
            spring = k * jnp.minimum(pen, pen_cap) * active * n_mask
            f_expl = spring - cc * vm  # rows t: -c_t v_t ; rows n: k pen - c_n v_n

            # Q = Jm @ f_expl per lane: fp32 VPU reduce over contact rows,
            # chunked so the broadcast product temporary stays ~300 kB
            # (a full (NP, MP, L) product is 5.2 MB of Mosaic value stack)
            Q = jnp.zeros((NP, L), jnp.float32)
            CH = 16
            for c in range(0, MP, CH):
                fe = jnp.expand_dims(f_expl[c : c + CH, :], 0)  # (1, CH, L)
                Q = Q + jnp.sum(jm_scr[:, c : c + CH, :] * fe, axis=1)

            rhs = tau + Q + qe - Cb

            # ---- resolve L L^T x = rhs (solver._chol_resolve_lanes_kernel)
            y_scr[:] = rhs
            for j in range(NP):
                Lj = lt_scr[j]
                yj = y_scr[j : j + 1, :] / Lj[j : j + 1, :]
                y2_scr[j : j + 1, :] = yj
                y_scr[:] = y_scr[:] - Lj * yj
            x_scr[:] = jnp.zeros_like(rhs)
            for j in range(NP - 1, -1, -1):
                Lj = lt_scr[j]
                s = jnp.sum(Lj * x_scr[:], axis=0, keepdims=True)
                x_scr[j : j + 1, :] = (y2_scr[j : j + 1, :] - s) / Lj[j : j + 1, :]
            x = x_scr[:]  # qacc

            # ---- integrate velocity + contact state ----------------------
            vel = jnp.clip(vel + dt * x, -max_vel, max_vel)
            vel_out[:] = vel
            # vm += dt * Jm^T qacc, chunked like Q above
            xe = jnp.expand_dims(x, 1)  # (NP, 1, L)
            dvm_rows = []
            for c in range(0, MP, CH):
                dvm_rows.append(jnp.sum(jm_scr[:, c : c + CH, :] * xe, axis=0))
            vm = vm + dt * jnp.concatenate(dvm_rows, axis=0)  # (MP, L)
            vm_scr[:] = vm
            pen_scr[:] = pen - dt * (n_mask * vm)

            # ---- integrate pose ------------------------------------------
            rp = rp_out[:]
            rp_row = jax.lax.broadcasted_iota(jnp.int32, rp.shape, 0)
            dvel3 = jnp.concatenate(
                [dt * vel[0:3, :], jnp.zeros((rp.shape[0] - 3, L), vel.dtype)], axis=0
            )
            rp_out[:] = rp + jnp.where(rp_row < 3, dvel3, 0.0)

            # per-body angular rates (root: body-frame vel[3:6]; balls:
            # joint rates) -> exp_map_to_quat(dt*w) -> q' = norm(q * dq)
            wbx = dot(om_ref[0], vel)  # (J, L)
            wby = dot(om_ref[1], vel)
            wbz = dot(om_ref[2], vel)
            mx, my, mz = dt * wbx, dt * wby, dt * wbz
            angm = jnp.sqrt(mx * mx + my * my + mz * mz)
            inv_a = 1.0 / jnp.maximum(angm, 1e-12)
            # normalize_angle on a norm (>=0, < 2pi at any capped velocity)
            ang_w = jnp.where(angm > np.pi, angm - 2.0 * np.pi, angm)
            msk = jnp.abs(angm) > 1e-5
            ang_w = jnp.where(msk, ang_w, 0.0)
            ax = jnp.where(msk, mx * inv_a, 0.0)
            ay = jnp.where(msk, my * inv_a, 0.0)
            az = jnp.where(msk, mz * inv_a, 1.0)
            # quat_from_angle_axis re-normalizes the axis (transforms.py:111)
            nrm = 1.0 / jnp.maximum(jnp.sqrt(ax * ax + ay * ay + az * az), 1e-9)
            half = 0.5 * ang_w
            sh = jnp.sin(half)
            dqx, dqy, dqz = ax * nrm * sh, ay * nrm * sh, az * nrm * sh
            dqw = jnp.cos(half)

            qx, qy, qz, qw = qc_out[0], qc_out[1], qc_out[2], qc_out[3]
            nx = qw * dqx + qx * dqw + qy * dqz - qz * dqy
            ny = qw * dqy - qx * dqz + qy * dqw + qz * dqx
            nz = qw * dqz + qx * dqy - qy * dqx + qz * dqw
            nw = qw * dqw - qx * dqx - qy * dqy - qz * dqz
            # quat_normalize: positive scalar part then unit norm
            sgn = jnp.where(nw < 0.0, -1.0, 1.0)
            qn = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz + nw * nw), 1e-9)
            s_all = sgn * qn
            qc_out[0] = nx * s_all
            qc_out[1] = ny * s_all
            qc_out[2] = nz * s_all
            qc_out[3] = nw * s_all

        # ---- last-substep diagnostics ------------------------------------
        # dof torque with the implicit damping correction (engine:1412)
        tq_out[:] = tau - KD * dt * x
        # final contact-frame forces: tangent rows unclamped, normal rows
        # clamped at zero (engine:1404-1407)
        vm = vm_scr[:]
        pen = pen_scr[:]
        spring = k * jnp.minimum(pen, pen_cap) * (pen > 0.0).astype(pen.dtype) * n_mask
        f_fin = spring - cc * vm
        fm_out[:] = jnp.where(n_mask > 0.5, jnp.maximum(f_fin, 0.0), f_fin)

    return kernel


def frozen_substeps_fused(
    model,
    root_pos, joint_quat, vel,
    lhs, Jm, C, c_t, c_n, pen0, v_t1, v_t2, v_n,
    pd_target, Q_ext=None,
    interpret: bool | None = None,
    lanes_inputs: bool = False,
    jm_transposed: bool = False,
):
    """Run all frozen-mode substeps in one Pallas kernel.

    Inputs are the per-control-step frozen quantities from
    `engine._step_frozen` (batch-major; `lhs` is the UNFACTORED implicit
    system matrix (B, N, N) — the Cholesky factorization happens inside
    the kernel); returns (root_pos', joint_quat', vel', dof_torque
    (B, N-6), f_m (B, 3A) final contact-frame forces ordered t1|t2|n).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phc_tpu.physics.solver import _pad_lanes

    interpret = _auto_interpret(interpret)
    cst, om, omT, J, N, NP = _substep_tables(model)
    B = vel.shape[0]
    A = c_t.shape[1]  # section-padded slot count (8-aligned upstream)
    M3 = 3 * A
    MP = -(-M3 // 8) * 8
    LANES = 128
    Bp = -(-B // LANES) * LANES

    # LHS to the factor kernel's lanes layout. lanes_inputs=True: the
    # caller already emits (NP, NP, B) lanes with identity pad diagonal
    # (lanes_dyn.mass_bias_lanes) — nothing to do but lane-pad. A
    # batch-major LHS padded to NP needs only the transpose; otherwise
    # _pad_lanes pads + sets the diag.
    if lanes_inputs:
        lhs_l = lhs
        if Bp != B:
            lhs_l = jnp.pad(lhs_l, ((0, 0), (0, 0), (0, Bp - B)))
            ii = np.arange(NP)
            lhs_l = lhs_l.at[ii, ii, B:].set(1.0)
    elif lhs.shape[-1] == NP and lhs.shape[-2] == NP:
        lhs_l = lhs.transpose(2, 1, 0)
        if Bp != B:
            lhs_l = jnp.pad(lhs_l, ((0, 0), (0, 0), (0, Bp - B)))
            ii = np.arange(NP)
            lhs_l = lhs_l.at[ii, ii, B:].set(1.0)
    else:
        lhs_l, _ = _pad_lanes(lhs, None, N, NP, B, Bp)

    dt = model.dt
    k, d = model.contact_stiffness, model.contact_damping
    pen_cap = model.max_depenetration_velocity * (d + k * dt) / k

    def lanes2(x, rows):  # (B, n) -> (rows, Bp)
        xt = x.T
        return jnp.pad(xt, ((0, rows - xt.shape[0]), (0, Bp - B)))

    if lanes_inputs:  # C arrives (NP, B) from the mass+bias lanes kernel
        C_l = jnp.pad(C, ((0, 0), (0, Bp - B))) if Bp != B else C
    else:
        C_l = lanes2(C, NP)
    pd_l = lanes2(
        jnp.concatenate([jnp.zeros((B, 6), pd_target.dtype), pd_target], axis=1), NP
    )
    vel_l = lanes2(vel, NP)
    qe_l = (
        lanes2(Q_ext, NP) if Q_ext is not None else jnp.zeros((NP, Bp), jnp.float32)
    )
    cc_l = lanes2(jnp.concatenate([c_t, c_t, c_n], axis=1), MP)
    pen_l = lanes2(
        jnp.concatenate([jnp.zeros((B, 2 * A), pen0.dtype), pen0], axis=1), MP
    )
    vm_l = lanes2(jnp.concatenate([v_t1, v_t2, v_n], axis=1), MP)
    rp_l = lanes2(root_pos, 8)
    qc_l = jnp.pad(joint_quat.transpose(2, 1, 0), ((0, 0), (0, 0), (0, Bp - B)))

    # contact Jacobian to lanes: -> (NP, MP, Bp). One relayout pass — the
    # kernel then reads it exactly once per control step (the XLA loop
    # read it 2x per substep). jm_transposed says which layout the caller
    # passed: False = (B, rows, 3A); True = the (B, 3A, rows) Gram-operand
    # layout the fused engine path emits. An explicit flag — the layouts
    # were previously inferred by shape sniffing, which is ambiguous
    # exactly when NPad == 3A (r4 advisor finding).
    if jm_transposed:
        Jm_l = Jm.transpose(2, 1, 0)  # (rows, 3A, B)
    else:
        Jm_l = Jm.transpose(1, 2, 0)
    row_pad = NP - Jm_l.shape[0]
    if row_pad or MP != M3 or Bp != B:
        Jm_l = jnp.pad(Jm_l, ((0, row_pad), (0, MP - M3), (0, Bp - B)))

    kernel = _make_substep_kernel(
        J, N, NP, A, MP, float(dt), int(model.substeps),
        float(k), float(d), float(pen_cap), float(model.max_velocity),
    )

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tile = lambda *rows: pl.BlockSpec(
        rows + (LANES,), (lambda i: (0,) * len(rows) + (i,)), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, J, Bp), jnp.float32),  # qc'
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),  # rp'
            jax.ShapeDtypeStruct((NP, Bp), jnp.float32),  # vel'
            jax.ShapeDtypeStruct((NP, Bp), jnp.float32),  # dof torque rows
            jax.ShapeDtypeStruct((MP, Bp), jnp.float32),  # final contact f
        ),
        grid=(Bp // LANES,),
        in_specs=[
            const_spec(cst.shape),
            const_spec(om.shape),
            const_spec(omT.shape),
            # the two large matrices stay in HBM; the kernel DMAs its lane
            # slice manually (auto-blocking would double-buffer ~17 MB)
            pl.BlockSpec(memory_space=pltpu.ANY),  # Lt
            pl.BlockSpec(memory_space=pltpu.ANY),  # Jm
            tile(NP),  # C
            tile(MP),  # cc
            tile(MP),  # pen0
            tile(MP),  # vm0
            tile(NP),  # pd
            tile(4, J),  # qc
            tile(8),  # rp
            tile(NP),  # vel
            tile(NP),  # qe
        ],
        out_specs=(
            tile(4, J),
            tile(8),
            tile(NP),
            tile(NP),
            tile(MP),
        ),
        scratch_shapes=[
            pltpu.VMEM((MP, LANES), jnp.float32),  # vm
            pltpu.VMEM((MP, LANES), jnp.float32),  # pen
            pltpu.VMEM((NP, LANES), jnp.float32),  # y
            pltpu.VMEM((NP, LANES), jnp.float32),  # y2
            pltpu.VMEM((NP, LANES), jnp.float32),  # x
            pltpu.VMEM((NP, NP, LANES), jnp.float32),  # Lt tile
            # dtype follows the caller's Jacobian (bf16 on TPU: halves the
            # biggest per-step DMA; the matvecs promote to f32)
            pltpu.VMEM((NP, MP, LANES), Jm_l.dtype),  # Jm tile
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        jnp.asarray(cst), jnp.asarray(om), jnp.asarray(omT),
        lhs_l, Jm_l, C_l, cc_l, pen_l, vm_l, pd_l, qc_l, rp_l, vel_l, qe_l,
    )
    qc_o, rp_o, vel_o, tq_o, fm_o = outs
    root_pos_n = rp_o[0:3, :B].T
    joint_quat_n = qc_o[:, :, :B].transpose(2, 1, 0)
    vel_n = vel_o[:N, :B].T
    dof_torque = tq_o[6:N, :B].T
    f_m = fm_o[:M3, :B].T  # (B, 3A) t1|t2|n
    return root_pos_n, joint_quat_n, vel_n, dof_torque, f_m
