"""Running observation normalization as functional train-state.

Port of the reference's jit-scripted RunningNorm module
(`/root/reference/puffer_phc/policies/running_norm.py:5-53`): clip-at-±10
standardization with a decoupled `update` that blends batch statistics with
weight 1/count (the reference's EMA quirk — NOT Welford; SURVEY.md §7
records this as load-bearing). State is a pytree, so it rides inside the
jitted train step and checkpoints with everything else.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RunningNormState(NamedTuple):
    mean: jax.Array  # (D,)
    var: jax.Array  # (D,)
    count: jax.Array  # () float


def init(dim: int) -> RunningNormState:
    return RunningNormState(
        mean=jnp.zeros((dim,), jnp.float32),
        var=jnp.ones((dim,), jnp.float32),
        count=jnp.ones((), jnp.float32),
    )


def normalize(state: RunningNormState, x: jax.Array, clip: float = 10.0, eps: float = 1e-5) -> jax.Array:
    return jnp.clip((x - state.mean) / jnp.sqrt(state.var + eps), -clip, clip)


def update(state: RunningNormState, batch: jax.Array) -> RunningNormState:
    """Blend batch mean/var with weight 1/count (reference :23-34)."""
    x = batch.reshape(-1, batch.shape[-1]).astype(jnp.float32)
    mean = x.mean(axis=0)
    var = x.var(axis=0)
    w = 1.0 / state.count
    return RunningNormState(
        mean=state.mean * (1.0 - w) + mean * w,
        var=state.var * (1.0 - w) + var * w,
        count=state.count + 1.0,
    )
