"""Checkpoint save/restore: one orbax-sharded pytree for the whole run.

TPU-native equivalent of the reference's torch checkpoints
(`/root/reference/puffer_phc/clean_pufferl/utils.py:18-56`): instead of
separate `model_*.pt` / `trainer_state.pt` files, the entire train state
(params, optimizer state, running-norm stats, RNG, counters) is one pytree
saved with orbax — atomic, shardable across hosts (every host restores the
same step, SURVEY.md §5.3/§5.4).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(data_dir: str, exp_id: str, epoch: int, state, config_dict: dict) -> str:
    """Write `<data_dir>/<exp_id>/ckpt/<epoch>` plus a config.json."""
    ocp = _ocp()
    base = Path(data_dir).resolve() / exp_id
    base.mkdir(parents=True, exist_ok=True)
    (base / "config.json").write_text(json.dumps(config_dict, indent=2, default=str))

    path = base / "ckpt" / f"{epoch:06d}"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return str(path)


def latest_checkpoint(data_dir: str, exp_id: str) -> Optional[str]:
    base = Path(data_dir).resolve() / exp_id / "ckpt"
    if not base.exists():
        return None
    steps = sorted([p for p in base.iterdir() if p.name.isdigit()])
    return str(steps[-1]) if steps else None


def load_checkpoint(path: str, target) -> Any:
    """Restore into the structure of `target` (an abstract/concrete pytree).

    The restore placement is the CURRENT backend's default device — made
    explicit because checkpoints are topology- and backend-portable (a
    TPU-saved checkpoint restores on CPU and vice versa; orbax refuses
    sharding-less deserialization for cross-backend restores)."""
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    import jax
    import jax.numpy as jnp

    # concrete target arrays carry the desired restore sharding (the current
    # backend's placement); explicit restore_args are required for
    # cross-backend restores in this orbax version
    concrete = jax.tree_util.tree_map(jnp.asarray, target)
    restore_args = ocp.checkpoint_utils.construct_restore_args(concrete)
    return ckptr.restore(str(Path(path).resolve()), item=concrete, restore_args=restore_args)
