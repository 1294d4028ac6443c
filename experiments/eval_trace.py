"""Trace WHERE the deterministic eval fails on the sample clip.

Loads a trained checkpoint, rolls the policy from t=0 exactly like the eval
harness, and prints per-body deviation detail around the failure window —
which body crosses the threshold first, its height vs the reference's
(ground-scuff detection), and the mean deviation that drives eval-mode
termination.

JAX_PLATFORMS= python experiments/eval_trace.py <ckpt_path>   (TPU)
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if "--cpu" in sys.argv:
    # env vars cannot override this sandbox's axon pin; jax.config can.
    # Keeps the TPU free for concurrent training/bench runs.
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache
setup_cache()

from phc_tpu.config import AppConfig
from phc_tpu.env import humanoid_env as henv
from phc_tpu.motionlib import MotionLib, get_motion_state
from phc_tpu.physics import forward_kinematics
from phc_tpu.rl import ppo as ppo_mod, running_norm
from phc_tpu.runtime import checkpoint as ckpt_mod
from phc_tpu.body_sets import BODY_NAMES

def _pop_opt(flag, default=None):
    if flag in sys.argv:
        i = sys.argv.index(flag)
        v = sys.argv[i + 1]
        del sys.argv[i : i + 2]
        return v
    return default

motion_file = _pop_opt("--motion-file", "/root/reference/sample_data/cmu_mocap_05_06.pkl")
motion_key = _pop_opt("--key")  # substring match against lib.motion_keys
n_steps = int(_pop_opt("--steps", "80"))
ckpt = sys.argv[1] if len(sys.argv) > 1 else None

cfg = AppConfig()
B = 4
cfg.env.num_envs = B
cfg.env.motion_file = motion_file

lib = MotionLib(cfg.env.motion_file, min_length=cfg.env.min_motion_len, max_length=600,
                is_deterministic=True, step_dt=1.0 / 30.0, seed=0)
mi = 0
if motion_key:
    hits = [i for i, k in enumerate(lib.motion_keys) if motion_key in k]
    assert hits, f"no motion key matches {motion_key!r}: {lib.motion_keys[:8]}"
    mi = hits[0]
    print(f"tracing motion {mi}: {lib.motion_keys[mi]}")
data = lib.load_motions(num_motions=B, sample_idxes=np.full(B, mi, np.int64),
                        randomize_heading=False, deterministic_crop=True)
env = henv.make_env(cfg.env, motion_ids=np.arange(B, dtype=np.int64), eval_mode=True)
ppo = ppo_mod.make_ppo(cfg.train, env, cfg.policy)
state = jax.jit(lambda r: ppo_mod.init_state(ppo, r))(jax.random.PRNGKey(0))
if ckpt:
    state = ckpt_mod.load_checkpoint(ckpt, state)
    print(f"loaded {ckpt} (epoch {int(np.asarray(state.epoch))})")

ids = jnp.arange(B, dtype=jnp.int32)

def act(obs):
    mu, _ = ppo.policy.apply(state.params, running_norm.normalize(state.obs_norm, obs))
    return mu

def full(d, s, obs, t):
    a = act(obs)
    s, out = henv.step(env, d, s, a)
    frame = forward_kinematics(env.model, s.physics)
    tm = jnp.minimum((t + 1.0) * env.control_dt, d.motion_lengths[:B])
    ref = get_motion_state(d, ids, tm)
    dev = jnp.linalg.norm(frame.pos - ref.rg_pos, axis=-1)
    return s, out.obs, out.terminated, dev, frame.pos[..., 2], ref.rg_pos[..., 2]

step_j = jax.jit(full)
es, obs = jax.jit(lambda d, r: henv.reset_all(env, d, r))(data, jax.random.PRNGKey(0))

n = n_steps
for t in range(n):
    es, obs, term, dev, z, zr = step_j(data, es, obs, jnp.float32(t))
    dev0 = np.asarray(dev)[0]
    z0, zr0 = np.asarray(z)[0], np.asarray(zr)[0]
    wb = int(dev0.argmax())
    if t >= 30 or t % 10 == 0 or bool(np.asarray(term)[0]):
        toes = [BODY_NAMES.index(x) for x in ("L_Toe", "R_Toe")]
        ank = [BODY_NAMES.index(x) for x in ("L_Ankle", "R_Ankle")]
        print(f"t={t:3d} mean={dev0.mean():.3f} max={dev0.max():.3f} worst={BODY_NAMES[wb]}"
              f" toeZ={z0[toes[0]]:.3f}/{z0[toes[1]]:.3f} refToeZ={zr0[toes[0]]:.3f}/{zr0[toes[1]]:.3f}"
              f" ankZ={z0[ank[0]]:.3f}/{z0[ank[1]]:.3f}"
              f" term={bool(np.asarray(term)[0])}")
    if bool(np.asarray(term)[0]):
        # per-body deviation table at failure
        order = np.argsort(-dev0)
        print("  failure breakdown:", ", ".join(f"{BODY_NAMES[i]}={dev0[i]:.3f}" for i in order[:8]))
        break
