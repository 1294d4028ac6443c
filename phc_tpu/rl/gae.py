"""Generalized Advantage Estimation as a reversed `lax.scan`.

TPU-native replacement for the reference's host-side Cython kernel
(`/root/reference/puffer_phc/c_gae.pyx:11-32`, invoked from
`clean_pufferl/core.py:249-251`): the reverse scan compiles into the same
XLA program as the rest of the update, vectorized over envs in the lane
dimension — no device->host->device round trip.

Two formulas:
  * "reference" replicates the Cython kernel exactly *per env*:
    delta[t] = r[t+1] + gamma*V[t+1]*(1-done[t+1]) - V[t], adv[T-1] = 0 —
    an off-by-one vs the textbook (rewards/dones indexed at t+1; SURVEY.md
    §7 'observable quirks'). Parity runs must use this.
  * "textbook" is the standard CleanRL formulation:
    delta[t] = r[t] + gamma*V[t+1]*(1-done[t]) - V[t] with V[T] = 0.

Note the reference applies its kernel to one flat (env-major, step-minor)
array, so env boundaries bleed a tiny amount of advantage between adjacent
envs; we scan per env (the quirk preserved is the time indexing, not the
boundary bleed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    dones: jax.Array,  # (T, B) float or bool
    values: jax.Array,  # (T, B)
    rewards: jax.Array,  # (T, B)
    gamma: float,
    gae_lambda: float,
    formula: str = "reference",
) -> jax.Array:
    """Returns advantages (T, B)."""
    dones = dones.astype(values.dtype)

    if formula == "reference":
        # delta[t] = r[t+1] + gamma V[t+1] (1 - d[t+1]) - V[t]; adv[T-1] = 0
        nextnonterminal = 1.0 - dones[1:]
        delta = rewards[1:] + gamma * values[1:] * nextnonterminal - values[:-1]

        def scan_fn(lastgaelam, x):
            d, nn = x
            lastgaelam = d + gamma * gae_lambda * nn * lastgaelam
            return lastgaelam, lastgaelam

        _, adv = jax.lax.scan(
            scan_fn, jnp.zeros_like(values[0]), (delta, nextnonterminal), reverse=True
        )
        return jnp.concatenate([adv, jnp.zeros_like(values[:1])], axis=0)

    if formula == "textbook":
        nextnonterminal = 1.0 - dones
        next_values = jnp.concatenate([values[1:], jnp.zeros_like(values[:1])], axis=0)
        # bootstrap cut at the end of the buffer (V[T] = 0 like the reference)
        delta = rewards + gamma * next_values * nextnonterminal - values

        def scan_fn(lastgaelam, x):
            d, nn = x
            lastgaelam = d + gamma * gae_lambda * nn * lastgaelam
            return lastgaelam, lastgaelam

        _, adv = jax.lax.scan(scan_fn, jnp.zeros_like(values[0]), (delta, nextnonterminal), reverse=True)
        return adv

    raise ValueError(f"unknown gae formula {formula!r}")
