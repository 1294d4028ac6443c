"""Tests for GAE, running norm, and policy heads against numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu.rl import gae, policies, running_norm


def reference_gae_numpy(dones, values, rewards, gamma, lam):
    """Literal port of the reference Cython kernel (c_gae.pyx:11-32) applied
    per env column."""
    T = len(rewards)
    adv = np.zeros(T, np.float32)
    lastgaelam = 0.0
    for t in range(T - 2, -1, -1):
        nextnonterminal = 1.0 - dones[t + 1]
        delta = rewards[t + 1] + gamma * values[t + 1] * nextnonterminal - values[t]
        lastgaelam = delta + gamma * lam * nextnonterminal * lastgaelam
        adv[t] = lastgaelam
    return adv


def test_gae_reference_formula_matches_cython_oracle():
    rng = np.random.default_rng(0)
    T, B = 32, 7
    dones = (rng.random((T, B)) < 0.1).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)

    got = np.asarray(
        gae.compute_gae(jnp.array(dones), jnp.array(values), jnp.array(rewards), 0.98, 0.2, "reference")
    )
    for b in range(B):
        want = reference_gae_numpy(dones[:, b], values[:, b], rewards[:, b], 0.98, 0.2)
        np.testing.assert_allclose(got[:, b], want, atol=1e-5)


def test_gae_textbook_formula():
    rng = np.random.default_rng(1)
    T, B = 16, 3
    dones = (rng.random((T, B)) < 0.15).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    got = np.asarray(
        gae.compute_gae(jnp.array(dones), jnp.array(values), jnp.array(rewards), 0.99, 0.95, "textbook")
    )
    # numpy oracle
    adv = np.zeros((T, B), np.float32)
    lastgaelam = np.zeros(B, np.float32)
    for t in range(T - 1, -1, -1):
        nextval = values[t + 1] if t + 1 < T else np.zeros(B, np.float32)
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + 0.99 * nextval * nonterm - values[t]
        lastgaelam = delta + 0.99 * 0.95 * nonterm * lastgaelam
        adv[t] = lastgaelam
    np.testing.assert_allclose(got, adv, atol=1e-5)


def test_gae_textbook_with_bootstrap():
    """The final step bootstraps from V(next obs), not zero."""
    T, B = 8, 2
    rng = np.random.default_rng(2)
    dones = np.zeros((T, B), np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    boot = rng.normal(size=(B,)).astype(np.float32)
    got = np.asarray(
        gae.compute_gae(
            jnp.array(dones), jnp.array(values), jnp.array(rewards), 0.99, 0.95,
            "textbook", bootstrap_value=jnp.array(boot),
        )
    )
    adv = np.zeros((T, B), np.float32)
    lastgaelam = np.zeros(B, np.float32)
    for t in range(T - 1, -1, -1):
        nextval = values[t + 1] if t + 1 < T else boot
        delta = rewards[t] + 0.99 * nextval - values[t]
        lastgaelam = delta + 0.99 * 0.95 * lastgaelam
        adv[t] = lastgaelam
    np.testing.assert_allclose(got, adv, atol=1e-5)


def test_gae_terminal_credit_alignment():
    """The r2 learning-collapse regression test: on same-index storage, the
    TERMINATING action's advantage must include its own reward and must NOT
    bootstrap from the next (post-reset) state's value. The raw reference
    index arithmetic ('reference_raw') violates both on this alignment —
    that is exactly why it is not the training default."""
    T = 6
    k = 3  # transition k terminates the episode
    dones = np.zeros((T, 1), np.float32)
    dones[k] = 1.0
    rewards = np.full((T, 1), 0.1, np.float32)
    rewards[k] = -5.0  # distinctive terminal reward
    values = np.zeros((T, 1), np.float32)
    values[k + 1] = 100.0  # juicy post-reset value — must NOT leak into adv[k]

    adv = np.asarray(
        gae.compute_gae(jnp.array(dones), jnp.array(values), jnp.array(rewards), 0.98, 0.2, "textbook")
    )[:, 0]
    # terminal action: adv[k] = r[k] - V[k], no bootstrap across the reset
    np.testing.assert_allclose(adv[k], -5.0, atol=1e-5)
    assert abs(adv[k] - (-5.0)) < 1e-4
    # and the step before it sees the terminal reward through the recurrence
    assert adv[k - 1] < 0.0

    # the raw-index formula on this (same-index) alignment does leak:
    adv_raw = np.asarray(
        gae.compute_gae(jnp.array(dones), jnp.array(values), jnp.array(rewards), 0.98, 0.2, "reference_raw")
    )[:, 0]
    assert adv_raw[k] > 50.0  # gets the post-reset V — the bug this guards against


def test_running_norm_update_matches_reference_ema():
    rng = np.random.default_rng(2)
    st = running_norm.init(5)
    mean_ref = np.zeros((5,))
    var_ref = np.ones((5,))
    count = 1.0
    for _ in range(4):
        batch = rng.normal(2.0, 3.0, size=(64, 5)).astype(np.float32)
        st = running_norm.update(st, jnp.array(batch))
        w = 1.0 / count
        mean_ref = mean_ref * (1 - w) + batch.mean(0) * w
        var_ref = var_ref * (1 - w) + batch.var(0) * w
        count += 1
    np.testing.assert_allclose(np.asarray(st.mean), mean_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.var), var_ref, rtol=1e-4)
    # normalize clips at +-10
    big = jnp.ones((1, 5)) * 1e6
    out = np.asarray(running_norm.normalize(st, big))
    assert np.all(out <= 10.0)


def test_policy_shapes_and_fixed_std():
    policy = policies.PHCPolicy(action_dim=69, layer_sizes=(64, 32))
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((2, 934)))
    mu, value = policy.apply(params, jnp.zeros((2, 934)))
    assert mu.shape == (2, 69)
    assert value.shape == (2,)
    std = policies.action_std(69)
    np.testing.assert_allclose(np.asarray(std), np.exp(-2.9), rtol=1e-6)
    std_det = policies.action_std(69, deterministic=True)
    assert np.all(np.asarray(std_det) <= 1e-6)


def test_gaussian_logprob_matches_scipy():
    from scipy.stats import norm as scipy_norm

    rng = np.random.default_rng(3)
    mu = rng.normal(size=(4, 6)).astype(np.float32)
    a = rng.normal(size=(4, 6)).astype(np.float32)
    std = np.full((6,), 0.3, np.float32)
    got = np.asarray(policies.gaussian_logprob(jnp.array(mu), jnp.array(std), jnp.array(a)))
    want = scipy_norm.logpdf(a, mu, std).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bound_loss():
    mu = jnp.array([[0.0, 0.95, -1.2]])
    val = float(policies.bound_loss(mu, soft_bound=0.9))
    want = ((0.95 - 0.9) ** 2 + (-1.2 + 0.9) ** 2) / 3
    np.testing.assert_allclose(val, want, rtol=1e-5)


def test_discriminator_shapes():
    disc = policies.Discriminator()
    params = disc.init(jax.random.PRNGKey(0), jnp.zeros((2, 1960)))
    logits = disc.apply(params, jnp.zeros((3, 1960)))
    assert logits.shape == (3,)
