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


def update(state: RunningNormState, batch: jax.Array, axis_name=None) -> RunningNormState:
    """Blend batch mean/var with weight 1/count (reference :23-34).

    axis_name: optional mesh axis to reduce the batch statistics over —
    under data parallelism every shard must blend in the GLOBAL batch
    moments. Moments are taken of (x - running mean) rather than of x:
    the one-pass var = E[x^2] - E[x]^2 form cancels catastrophically in
    float32 for features with |mean| >> std (e.g. root height ~0.9 with
    mm-scale spread), and centering on the nearby running mean removes
    the cancellation while still composing exactly with the pmean
    reduction (equal shard sizes => shifted per-shard moments average to
    the shifted global moments)."""
    x = batch.reshape(-1, batch.shape[-1]).astype(jnp.float32)
    xc = x - state.mean
    m1 = xc.mean(axis=0)
    m2 = (xc * xc).mean(axis=0)
    if axis_name is not None:
        m1 = jax.lax.pmean(m1, axis_name)
        m2 = jax.lax.pmean(m2, axis_name)
    mean = m1 + state.mean
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    w = 1.0 / state.count
    return RunningNormState(
        mean=state.mean * (1.0 - w) + mean * w,
        var=state.var * (1.0 - w) + var * w,
        count=state.count + 1.0,
    )
