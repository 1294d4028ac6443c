"""Phase-level TPU profile of the train step: rollout / GAE / update /
physics / solver, each timed as its own jitted program with scalar-fetch
synchronization (axon tunnel: block_until_ready is a no-op).

Usage: python scripts/bench_profile.py [--envs 4096]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SAMPLE_PKL = "/root/reference/sample_data/cmu_mocap_05_06.pkl"


def timeit(name, fn, *args, iters=3):
    """fn must return something whose first leaf is fetchable."""
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])  # compile + sync
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{name:40s} {dt*1000:9.1f} ms", flush=True)
    return dt


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))

    import jax
    import jax.numpy as jnp

    from phc_tpu.runtime.jax_setup import setup_cache

    setup_cache()
    print("devices:", jax.devices())

    from phc_tpu.config import EnvConfig, TrainConfig, PolicyConfig
    from phc_tpu.env import humanoid_env as henv
    from phc_tpu.motionlib import MotionLib
    from phc_tpu.rl import ppo as ppo_mod
    from phc_tpu.physics import engine as eng

    env_cfg = EnvConfig(num_envs=num_envs, motion_file=SAMPLE_PKL)
    train_cfg = TrainConfig(batch_size=num_envs * 32, minibatch_size=num_envs * 32 // 4)
    pol_cfg = PolicyConfig()

    lib = MotionLib(SAMPLE_PKL, is_deterministic=True,
                    step_dt=env_cfg.physics.sim_timestep * env_cfg.physics.control_freq_inv)
    data = lib.load_motions(num_motions=min(num_envs, 256))
    env = henv.make_env(env_cfg, motion_ids=np.zeros(num_envs, np.int64))
    ppo = ppo_mod.make_ppo(train_cfg, env, pol_cfg)

    state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(jax.random.PRNGKey(0))
    runner = jax.jit(lambda d, r: ppo_mod.init_runner(ppo, d, r))(data, jax.random.PRNGKey(1))
    float(jax.jit(lambda s, r: s.global_step + r.obs.sum())(state, runner))
    print("init done", flush=True)

    # --- rollout glue attribution -------------------------------------------
    from phc_tpu.motionlib import get_motion_state
    from phc_tpu.env import kernels as ek
    from phc_tpu.env.humanoid_env import _compute_obs

    est = runner.env_state

    def rep32(fn):
        def wrapped(*args):
            def body(c, _):
                return c + 1.0 + fn(c, *args) * 1e-20, None
            out, _ = jax.lax.scan(body, 0.0, None, length=32)
            return out
        return jax.jit(wrapped)

    def motion_q(c, st):
        t = st.motion_times_start + c * 1e-6
        ref = get_motion_state(data, st.motion_ids, t)
        return ref.rg_pos.sum() + ref.body_vel.sum() + ref.dof_pos.sum()

    _f = rep32(motion_q)
    timeit("32x get_motion_state", _f, est)

    def obs_only(c, st):
        frame = eng.forward_kinematics(env.model, st.physics._replace(root_pos=st.physics.root_pos + c * 1e-9))
        ref = get_motion_state(data, st.motion_ids, st.motion_times_start + c * 1e-6)
        return _compute_obs(env, frame, ref).sum()

    _f2 = rep32(obs_only)
    timeit("32x FK + motion_q + obs build", _f2, est)

    from phc_tpu.rl import policies as pol
    policy = pol.PHCPolicy(action_dim=env.num_dofs)
    pparams = state.params

    def pol_fwd(c, st, pp):
        mu, v = policy.apply(pp, runner.obs + c * 1e-9)
        return mu.sum() + v.sum()

    _f3 = rep32(pol_fwd)
    timeit("32x policy forward", _f3, est, pparams)

    import phc_tpu.env.humanoid_env as henv2

    def env_step_chain(st):
        def body(c, _):
            st2, out = henv2.step(env, data, c, out_prev * 0.0 + jnp.zeros((num_envs, 69)) if False else jnp.zeros((num_envs, 69)))
            return st2, out.reward.sum()
        # chain real env states through the scan (true sequential cost)
        def body2(c, _):
            st2, out = henv2.step(env, data, c, jnp.zeros((num_envs, 69)))
            return st2, out.reward.sum()
        stf, rs = jax.lax.scan(body2, st, None, length=32)
        return rs.sum()

    _f4 = jax.jit(env_step_chain)
    timeit("32x full env.step (zero actions)", _f4, est)

    # --- full step ---------------------------------------------------------
    full = jax.jit(lambda d, s, r: ppo_mod.train_step(ppo, d, s, r))
    t_full = timeit("full train_step", lambda: full(data, state, runner))

    # --- optional xprof-compatible trace capture (SURVEY §5.1) -------------
    # BENCH_TRACE_DIR=/tmp/trace captures one full train_step under
    # jax.profiler (host + device events where the backend supports them);
    # inspect with `tensorboard --logdir` / xprof.
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            _, _, tl = full(data, state, runner)
            float(tl["policy_loss"])
        print(f"jax profiler trace written to {trace_dir}", flush=True)

    # --- rollout only ------------------------------------------------------
    roll = jax.jit(lambda d, s, r: ppo_mod.collect_rollout(ppo, d, s, r))
    t_roll = timeit("rollout (32 env steps + fwd)", lambda: roll(data, state, runner))

    # --- physics only: 32 control steps of pure sim -----------------------
    model = env.model
    phys_state = runner.env_state.physics if hasattr(runner.env_state, "physics") else None
    if phys_state is None:
        # find the PhysicsState leaf
        for f in runner.env_state._fields:
            v = getattr(runner.env_state, f)
            if isinstance(v, eng.PhysicsState):
                phys_state = v
                break
    tgt = jnp.zeros((num_envs, 69))

    def phys32(ps):
        def body(s, _):
            s2, _ = eng.step(model, s, tgt)
            return s2, None
        out, _ = jax.lax.scan(body, ps, None, length=32)
        return out.root_pos

    t_phys = timeit("physics only (32 ctrl = 64 substeps)", jax.jit(phys32), phys_state)

    # --- one substep pieces (hoist-proof: perturb state per iteration) ----
    def scan64(fn):
        """64x scan; the body input depends on the carry so XLA cannot
        hoist the computation out of the loop as loop-invariant."""

        def wrapped(ps):
            def body(c, _):
                p = ps._replace(root_pos=ps.root_pos + c * 1e-12)
                return c + 1.0 + fn(p) * 1e-20, None

            out, _ = jax.lax.scan(body, 0.0, None, length=64)
            return out

        return wrapped

    from phc_tpu.physics.solver import spd_solve

    def fk_only(p):
        return eng.forward_kinematics(model, p).pos.sum()

    def fk_s(p):
        f = eng.forward_kinematics(model, p)
        return eng._motion_subspace(model, f).sum()

    def fk_m(p):
        f = eng.forward_kinematics(model, p)
        return eng.mass_matrix(model, f).sum()

    def fk_c(p):
        f = eng.forward_kinematics(model, p)
        return eng.bias_forces(model, f, p).sum()

    def fk_dyn(p):
        f = eng.forward_kinematics(model, p)
        I_sp = eng._spatial_inertia_world(model, f)
        S = eng._motion_subspace(model, f)
        M = eng._mass_matrix_from(model, I_sp, S)
        C = eng._bias_from(model, f, p, I_sp, S)
        return M.sum() + C.sum()

    def fk_contact(p):
        f = eng.forward_kinematics(model, p)
        Sc = eng._motion_subspace_comps(model, f)
        cs = eng._contact_system(model, f, Sc)
        return cs.Jm.sum() + cs.v_t1.sum() + cs.v_n.sum()

    def fk_contact_stage(stage):
        def fn(p):
            f = eng.forward_kinematics(model, p)
            Sc = eng._motion_subspace_comps(model, f)
            out = eng._contact_system(model, f, Sc, _stage=stage)
            return sum(o.sum() for o in out)

        return fn

    def fk_contact_lhs(p):
        """contact system + the LHS rank update + Q_contact (everything the
        substep derives from contacts, minus the post-solve force block)."""
        f = eng.forward_kinematics(model, p)
        Sc = eng._motion_subspace_comps(model, f)
        cs = eng._contact_system(model, f, Sc)
        dt = model.dt
        k, d = model.contact_stiffness, model.contact_damping
        f_n_pred = jnp.maximum(k * cs.pen - d * cs.v_n, 0.0) * cs.active
        v_t_norm = jnp.sqrt(cs.v_t1**2 + cs.v_t2**2 + 1e-12)
        c_t = model.friction * f_n_pred / (v_t_norm + model.contact_vel_eps)
        c_n = (d + k * dt) * cs.active
        coef_m = jnp.concatenate([c_t, c_t, c_n], axis=-1)
        f_expl_m = jnp.concatenate(
            [-c_t * cs.v_t1, -c_t * cs.v_t2, k * cs.pen * cs.active - c_n * cs.v_n], -1
        )
        Q = jnp.einsum("bnm,bm->bn", cs.Jm, f_expl_m, precision=jax.lax.Precision.HIGH)
        upd = jnp.einsum(
            "bnm,bm,bkm->bnk", cs.Jm, coef_m, cs.Jm, precision=jax.lax.Precision.HIGH
        )
        return Q.sum() + upd.sum()

    def fk_m_solve(p):
        f = eng.forward_kinematics(model, p)
        M = eng.mass_matrix(model, f)
        return spd_solve(M, p.vel, base=24, refine=2).sum()

    def fk_m_lanes(p):
        from phc_tpu.physics.solver import chol_solve_lanes

        f = eng.forward_kinematics(model, p)
        M = eng.mass_matrix(model, f)
        return chol_solve_lanes(M, p.vel).sum()

    def substep_full(p):
        s2, info = eng._physics_substep(model, p, tgt)
        return s2.root_pos.sum()

    timeit("64x FK only", jax.jit(scan64(fk_only)), phys_state)
    timeit("64x FK+S", jax.jit(scan64(fk_s)), phys_state)
    timeit("64x FK+dynamics (M+C shared)", jax.jit(scan64(fk_dyn)), phys_state)
    timeit("64x FK+contact system", jax.jit(scan64(fk_contact)), phys_state)
    timeit("64x FK+contact narrow phase", jax.jit(scan64(fk_contact_stage("narrow"))), phys_state)
    timeit("64x FK+contact narrow+compact", jax.jit(scan64(fk_contact_stage("compact"))), phys_state)
    timeit("64x FK+contact+LHS assembly", jax.jit(scan64(fk_contact_lhs)), phys_state)
    timeit("64x FK+M+spd_solve", jax.jit(scan64(fk_m_solve)), phys_state)
    timeit("64x FK+M+chol_lanes", jax.jit(scan64(fk_m_lanes)), phys_state)
    timeit("64x full substep", jax.jit(scan64(substep_full)), phys_state)

    # --- knockout attribution (each removes one piece from the REAL substep;
    # deltas vs "full" are unconfounded by measurement barriers) -----------
    for name, sk in [
        ("- solve", {"solve"}),
        ("- contacts", {"contacts"}),
        ("- contacts - solve", {"contacts", "solve"}),
        ("- mass - bias", {"mass", "bias"}),
        ("bare (all knocked out)", {"mass", "bias", "contacts", "solve"}),
    ]:
        eng._DEBUG_SKIP = frozenset(sk)
        try:
            timeit(f"64x substep {name}", jax.jit(scan64(substep_full)), phys_state)
        finally:
            eng._DEBUG_SKIP = frozenset()

    # --- frozen-path knockouts (the PRODUCTION substep mode; the block
    # above attributes the legacy full-rebuild path) -------------------------
    def frozen32(ps):
        def body(s, _):
            s2, _ = eng._step_frozen(model, s, tgt)
            return s2, None

        out, _ = jax.lax.scan(body, ps, None, length=32)
        return out.root_pos

    timeit("32x frozen ctrl step (full)", jax.jit(frozen32), phys_state)
    for name, sk in [
        ("- bias", {"bias"}),
        ("- contact build", {"contacts"}),
        ("- gram", {"gram"}),
        ("- qcontact matvec", {"qcontact"}),
        ("- vm update", {"vmupdate"}),
        ("- solve", {"solve"}),
        ("- all contact+solve", {"contacts", "gram", "qcontact", "vmupdate", "solve"}),
        ("bare", {"mass", "bias", "contacts", "gram", "qcontact", "vmupdate", "solve"}),
    ]:
        eng._DEBUG_SKIP = frozenset(sk)
        try:
            timeit(f"32x frozen {name}", jax.jit(frozen32), phys_state)
        finally:
            eng._DEBUG_SKIP = frozenset()

    # --- GAE ---------------------------------------------------------------
    from phc_tpu.rl import gae as gae_mod
    T = 32
    rew = jnp.ones((T, num_envs))
    val = jnp.ones((T, num_envs))
    dones = jnp.zeros((T, num_envs))
    timeit("GAE scan", jax.jit(lambda d, v, r: gae_mod.compute_gae(d, v, r, 0.98, 0.2).sum()), dones, val, rew)

    # --- update only --------------------------------------------------------
    print(f"update ~= {1000*(t_full - t_roll):9.1f} ms (full - rollout)")


if __name__ == "__main__":
    main()
