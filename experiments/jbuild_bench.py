"""J-build (merged contact Jacobian) formulation shootout on the TPU.

Compares: current broadcast-FMA chain, einsum on stacked S, a variant that
folds masks before the sum, and approx_max_k vs exact top_k for the
compaction. Timing: scalar-fetch sync, 16 perturbed reps per jit call
(subtract the shared fk+narrow baseline between rows; a ~1.6 ms/iter
tunnel-latency floor rides every row equally).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.runtime.jax_setup import setup_cache

setup_cache()

from phc_tpu.physics import engine as eng
from phc_tpu.physics.model import build_smpl_model

model = build_smpl_model()
B = 4096
state = eng.default_state(model, B)
state = state._replace(
    vel=jax.random.normal(jax.random.PRNGKey(0), state.vel.shape) * 0.5,
    root_pos=state.root_pos.at[:, 2].set(0.85),
)

REP = 16


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    print(f"{name:44s} {float(np.median(ts))/REP*1000:8.3f} ms/iter", flush=True)


def rep(body):
    def f(st):
        acc = 0.0
        for i in range(REP):
            s2 = st._replace(
                root_pos=st.root_pos + i * 1e-6,
                joint_quat=st.joint_quat + i * 1e-7,
                vel=st.vel + i * 1e-7,
            )
            acc = acc + body(s2)
        return acc
    return jax.jit(f)


def base(st):
    f = eng.forward_kinematics(model, st)
    Sc = eng._motion_subspace_comps(model, f)
    return sum(x.sum() for x in Sc)


def full_cs(st):
    f = eng.forward_kinematics(model, st)
    Sc = eng._motion_subspace_comps(model, f)
    cs = eng._contact_system(model, f, Sc)
    return cs.Jm.sum() + cs.pen.sum()


def compact_only(st):
    f = eng.forward_kinematics(model, st)
    Sc = eng._motion_subspace_comps(model, f)
    out = eng._contact_system(model, f, Sc, _stage="compact")
    return sum(o.sum() for o in out)


def narrow_only(st):
    f = eng.forward_kinematics(model, st)
    Sc = eng._motion_subspace_comps(model, f)
    out = eng._contact_system(model, f, Sc, _stage="narrow")
    return sum(o.sum() for o in out)


print("devices:", jax.devices(), flush=True)
timeit("fk+S comps (baseline)", rep(base), state)
timeit("narrow only (+base)", rep(narrow_only), state)
timeit("narrow+compact (+base)", rep(compact_only), state)
timeit("full contact system (+base)", rep(full_cs), state)
