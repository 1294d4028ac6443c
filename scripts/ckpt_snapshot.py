"""Portable policy snapshots: params + normalizer stats as one .npz.

Why this exists: the full orbax checkpoint (params + Adam state +
counters) is ~240 MB and lives under the gitignored `ckpt/` tree, which
does NOT survive round boundaries in this environment — round 4 started
from scratch because round 3's checkpoints were wiped with the workspace.
The capability asset (the trained policy + its running-norm statistics,
~70 MB) is small enough to commit. Optimizer state is deliberately
dropped: resuming a run onto a new corpus resets the LR-decay clock
anyway (TrainConfig.lr_decay_start_epoch, the r3c finding), and Adam
moments re-warm within a few epochs.

Usage:
  # save:   snapshot an orbax checkpoint's policy into a committed npz
  python scripts/ckpt_snapshot.py save experiments/run/ckpt/018000 \
      experiments/run/policy_018000.npz

  # restore into training: train.py --snapshot-path <npz> (loads params,
  # obs/amp norms, and global_step/epoch counters into the fresh state
  # before the usual auto-resume logic)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def save(ckpt_path: str, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    p = str(Path(ckpt_path).resolve())
    meta = ckptr.metadata(p)
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), dict(tree.tree) if hasattr(tree, "tree") else tree
    )
    state = ckptr.restore(p, restore_args=restore_args)
    flat = {}

    def put(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        for path, leaf in leaves:
            key = prefix + jax.tree_util.keystr(path)
            flat[key] = np.asarray(leaf)

    # dict-restored pytree: index by the PPOState field names
    for field in ("params", "obs_norm", "amp_norm"):
        if isinstance(state, dict) and field in state:
            put(field, state[field])
    for counter in ("global_step", "epoch"):
        if isinstance(state, dict) and counter in state:
            flat[counter] = np.asarray(state[counter])
    np.savez_compressed(out_path, **flat)
    total = sum(v.size for v in flat.values())
    print(f"wrote {out_path}: {len(flat)} arrays, {total/1e6:.1f}M elements")


def restore_into(npz_path: str, state):
    """Load a snapshot into a fresh PPOState (returns the updated state).
    Counters transfer so LR schedules and logging continue from the
    snapshot's step; optimizer state stays freshly initialized."""
    import jax
    import jax.numpy as jnp

    import re

    data = np.load(npz_path, allow_pickle=False)

    def canon(key):
        # orbax restores dicts (keystr "obs_norm['mean']"), live states are
        # NamedTuples (keystr "obs_norm.mean") — match on the normalized form
        return re.sub(r"\W+", ".", key).strip(".")

    by_canon = {canon(k): k for k in data.files}

    def fill(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for path, leaf in leaves:
            key = canon(prefix + jax.tree_util.keystr(path))
            if key in by_canon:
                arr = data[by_canon[key]]
                assert arr.shape == tuple(leaf.shape), (key, arr.shape, leaf.shape)
                out.append(jnp.asarray(arr))
            else:
                print(f"snapshot: no saved value for {key}, keeping fresh init")
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    state = state._replace(params=fill("params", state.params))
    if any(k.startswith("obs_norm") for k in data.files):
        state = state._replace(obs_norm=fill("obs_norm", state.obs_norm))
    if any(k.startswith("amp_norm") for k in data.files):
        state = state._replace(amp_norm=fill("amp_norm", state.amp_norm))
    for counter in ("global_step", "epoch"):
        if counter in data.files:
            state = state._replace(**{counter: jnp.asarray(data[counter])})
    return state


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "save":
        save(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(__doc__)
