"""Actor/critic/discriminator policies in flax.linen.

Port of the reference policy family
(`/root/reference/puffer_phc/policies/`): `PHCPolicy` (6-layer SiLU MLP
actor + critic with terminal LayerNorm, `phc_policy.py:22-61`),
`LSTMCriticPolicy` / `LSTMActorPolicy` (`lstm_policy.py:25-148`), and the
AMP discriminator head (`discriminator_policy.py:43-79`). Conventions kept:

  * orthogonal init (std sqrt(2), output heads 0.01) — pufferlib's
    `layer_init`;
  * fixed non-trainable log-std of -2.9 (`discriminator_policy.py:30-34`);
  * deterministic-eval clamps std to 1e-6 (`phc_policy.py:51`);
  * soft bound loss at 0.9 * action-bound (`discriminator_policy.py:103-107`).

Observation normalization lives OUTSIDE the network (see running_norm.py) —
policies consume already-normalized observations.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

SOFT_BOUND = 0.9
FIXED_LOGSTD = -2.9

# Trunk compute dtype. Params stay fp32 (param_dtype default); the trunk
# matmuls already run as single bf16 MXU passes at DEFAULT precision, so
# bf16 activations change no matmul numerics — they halve the HBM traffic
# of the activations stashed for the backward pass (the update phase is
# bandwidth-bound past the MXU roofline at minibatch 32768). LayerNorm and
# both output heads run fp32: the PPO ratio/KL and value targets stay
# full-precision.
TRUNK_DTYPE = jnp.bfloat16


def _dense(out, std=jnp.sqrt(2.0), dtype=None):
    return nn.Dense(
        out,
        kernel_init=nn.initializers.orthogonal(std),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
    )


class MLP(nn.Module):
    sizes: Sequence[int]
    act: str = "silu"
    out_std: float = 1.4142135623730951  # sqrt(2)
    dtype: Optional[jnp.dtype] = None  # trunk compute dtype; output is fp32

    @nn.compact
    def __call__(self, x):
        act = {"silu": nn.silu, "relu": nn.relu}[self.act]
        for s in self.sizes[:-1]:
            x = act(_dense(s, dtype=self.dtype)(x))
        return _dense(self.sizes[-1], std=self.out_std)(x.astype(jnp.float32))


class PHCPolicy(nn.Module):
    """MLP actor-critic (reference `phc_policy.py:22-61`).

    Trunks: [obs] -> layer_sizes -> hidden, SiLU between layers, then
    LayerNorm + SiLU. Heads: mu (std 0.01) and value (std 0.01).
    """

    action_dim: int
    hidden_size: int = 512
    layer_sizes: Tuple[int, ...] = (2048, 1536, 1024, 1024, 512)
    dtype: Optional[jnp.dtype] = TRUNK_DTYPE

    @nn.compact
    def __call__(self, obs):
        trunk_sizes = list(self.layer_sizes) + [self.hidden_size]

        a = obs
        for s in trunk_sizes[:-1]:
            a = nn.silu(_dense(s, dtype=self.dtype)(a))
        a = _dense(trunk_sizes[-1], dtype=self.dtype)(a)
        a = nn.silu(nn.LayerNorm(dtype=jnp.float32)(a.astype(jnp.float32)))
        mu = _dense(self.action_dim, std=0.01)(a)

        c = obs
        for s in trunk_sizes[:-1]:
            c = nn.silu(_dense(s, dtype=self.dtype)(c))
        c = _dense(trunk_sizes[-1], dtype=self.dtype)(c)
        c = nn.silu(nn.LayerNorm(dtype=jnp.float32)(c.astype(jnp.float32)))
        value = _dense(1, std=0.01)(c)[..., 0]

        return mu, value


class LSTMCriticPolicy(nn.Module):
    """MLP actor + LSTM critic (reference `lstm_policy.py:25-87`).

    __call__ consumes a time-major window (T, B, obs) plus carry and scans
    the critic LSTM; the actor is stateless per step.
    """

    action_dim: int
    hidden_size: int = 512

    def setup(self):
        self.actor = MLP(
            sizes=(2048, 1536, 1024, 1024, 512, self.hidden_size, self.action_dim),
            act="silu",
            out_std=0.01,
        )
        self.critic_trunk = MLP(sizes=(2048, 1024, 1024, self.hidden_size), act="relu")
        self.lstm = nn.OptimizedLSTMCell(self.hidden_size)
        self.value_head = _dense(1, std=0.01)

    def __call__(self, obs_tm, carry):
        """obs_tm: (T, B, obs); carry: ((B,H),(B,H)). Returns (mu (T,B,A),
        value (T,B), new_carry)."""
        mu = self.actor(obs_tm)
        enc = nn.relu(self.critic_trunk(obs_tm))

        def scan_fn(cell, c, x):
            c, h = cell(c, x)
            return c, h

        scan = nn.transforms.scan(
            scan_fn, variable_broadcast="params", split_rngs={"params": False}
        )
        carry, hs = scan(self.lstm, carry, enc)
        value = self.value_head(nn.relu(hs))[..., 0]
        return mu, value, carry

    def initial_carry(self, batch: int):
        zeros = jnp.zeros((batch, self.hidden_size))
        return (zeros, zeros)


class LSTMActorPolicy(nn.Module):
    """LSTM actor + MLP critic (reference `lstm_policy.py:91-148`).

    Actor trunk (2048, 2048, 1024 -> hidden, SiLU) feeds the LSTM; mu head
    reads the recurrent state through SiLU. The critic is a stateless ReLU
    MLP (1024, 1024, 512, 256 -> 1) on the normalized obs. Same time-major
    (T, B, obs) + carry interface as LSTMCriticPolicy.
    """

    action_dim: int
    hidden_size: int = 512

    def setup(self):
        self.actor_trunk = MLP(sizes=(2048, 2048, 1024, self.hidden_size), act="silu")
        self.lstm = nn.OptimizedLSTMCell(self.hidden_size)
        self.mu_head = _dense(self.action_dim, std=0.01)
        self.critic = MLP(sizes=(1024, 1024, 512, 256, 1), act="relu", out_std=0.01)

    def __call__(self, obs_tm, carry):
        """obs_tm: (T, B, obs); carry: ((B,H),(B,H)). Returns (mu (T,B,A),
        value (T,B), new_carry)."""
        enc = nn.silu(self.actor_trunk(obs_tm))

        def scan_fn(cell, c, x):
            c, h = cell(c, x)
            return c, h

        scan = nn.transforms.scan(
            scan_fn, variable_broadcast="params", split_rngs={"params": False}
        )
        carry, hs = scan(self.lstm, carry, enc)
        mu = self.mu_head(nn.silu(hs))
        value = self.critic(obs_tm)[..., 0]
        return mu, value, carry

    def initial_carry(self, batch: int):
        zeros = jnp.zeros((batch, self.hidden_size))
        return (zeros, zeros)


class Discriminator(nn.Module):
    """AMP discriminator MLP (reference `discriminator_policy.py:43-53`)."""

    hidden_size: int = 512

    @nn.compact
    def __call__(self, amp_obs):
        x = nn.relu(_dense(1024)(amp_obs))
        x = nn.relu(_dense(self.hidden_size)(x))
        return _dense(1)(x)[..., 0]


# ---------------------------------------------------------------------------
# Gaussian policy head utilities (fixed sigma)
# ---------------------------------------------------------------------------


def action_std(action_dim: int, deterministic: bool = False) -> jax.Array:
    std = jnp.exp(jnp.full((action_dim,), FIXED_LOGSTD))
    if deterministic:
        std = jnp.minimum(std, 1e-6)
    return std


def sample_action(rng: jax.Array, mu: jax.Array, std: jax.Array) -> jax.Array:
    return mu + std * jax.random.normal(rng, mu.shape)


def sample_action_per_env(env_keys: jax.Array, mu: jax.Array, std: jax.Array) -> jax.Array:
    """Sample with one PRNG key per env (env_keys: (B, 2), mu: (B, A)).

    Drawing each env's noise from its own stream makes the rollout invariant
    to data sharding: shard_map over the batch sees the same noise per env
    as a single-device run (the DP equivalence contract)."""
    noise = jax.vmap(lambda k, m: jax.random.normal(k, m.shape))(env_keys, mu)
    return mu + std * noise


def gaussian_logprob(mu: jax.Array, std: jax.Array, action: jax.Array) -> jax.Array:
    """Sum of per-dim Normal log-probs (pufferlib uses Normal(mu, std) with
    independent dims, `clean_pufferl/core.py:158`)."""
    var = std * std
    lp = -0.5 * ((action - mu) ** 2 / var + jnp.log(2.0 * jnp.pi * var))
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(std: jax.Array, action_dim: int) -> jax.Array:
    return jnp.sum(0.5 * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.log(std))


def bound_loss(mu: jax.Array, soft_bound: float = SOFT_BOUND) -> jax.Array:
    """Soft action-bound penalty (reference `discriminator_policy.py:103-107`)."""
    over = jnp.where(mu > soft_bound, (mu - soft_bound) ** 2, 0.0)
    under = jnp.where(mu < -soft_bound, (mu + soft_bound) ** 2, 0.0)
    return jnp.mean(over + under)
