"""Generalized Advantage Estimation as a parallel (associative) scan.

TPU-native replacement for the reference's host-side Cython kernel
(`/root/reference/puffer_phc/c_gae.pyx:11-32`, invoked from
`clean_pufferl/core.py:249-251`): the recurrence compiles into the same
XLA program as the rest of the update as a log-depth associative scan,
vectorized over envs in the lane dimension — no device->host->device
round trip and no T-step sequential loop.

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


def _reverse_linear_recurrence(delta: jax.Array, coef: jax.Array) -> jax.Array:
    """adv[t] = delta[t] + coef[t] * adv[t+1] (adv[T] = 0) via
    jax.lax.associative_scan — log2(T) parallel levels instead of T
    sequential scan steps (a T=32 lax.scan costs ~24 ms at B=4096 on the
    TPU backend purely in loop latency; the associative form is ~5 fused
    sweeps over the (T, B) arrays)."""

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    # flip time so the recurrence runs forward, then prefix-compose the
    # affine maps x -> a x + b
    a = jnp.flip(coef, axis=0)
    b = jnp.flip(delta, axis=0)
    _, y = jax.lax.associative_scan(combine, (a, b), axis=0)
    return jnp.flip(y, axis=0)


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
        adv = _reverse_linear_recurrence(delta, gamma * gae_lambda * nextnonterminal)
        return jnp.concatenate([adv, jnp.zeros_like(values[:1])], axis=0)

    if formula == "textbook":
        nextnonterminal = 1.0 - dones
        next_values = jnp.concatenate([values[1:], jnp.zeros_like(values[:1])], axis=0)
        # bootstrap cut at the end of the buffer (V[T] = 0 like the reference)
        delta = rewards + gamma * next_values * nextnonterminal - values
        adv = _reverse_linear_recurrence(delta, gamma * gae_lambda * nextnonterminal)
        return adv

    raise ValueError(f"unknown gae formula {formula!r}")
