"""core/eigen.py: spectral joint-move logprob ≡ Cholesky logprob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.core.eigen import joint_eig_cache, log_marginal_eig
from spearmint_tpu.core.likelihood import GPHypers, log_marginal
from spearmint_tpu.mcmc.chains import (
    MCMCConfig, _joint_logprob, _joint_logprob_eig, sample_hypers,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(3)
    n, pad, d = 37, 48, 3
    x = np.zeros((pad, d), np.float32)
    x[:n] = rng.rand(n, d)
    y = np.zeros(pad, np.float32)
    y[:n] = np.sin(4 * x[:n, 0]) + 0.1 * rng.randn(n)
    mask = np.arange(pad) < n
    return jnp.array(x), jnp.array(y), jnp.array(mask)


def test_log_marginal_matches_cholesky(problem):
    x, y, mask = problem
    ls = jnp.array([0.7, 1.3, 0.4], jnp.float32)
    cache = joint_eig_cache(x, y, mask, ls)
    for mean, amp2, noise in [(0.0, 1.0, 1e-3), (0.3, 0.5, 0.05),
                              (-0.2, 2.5, 1e-4)]:
        want = log_marginal(
            x, y, mask, GPHypers(jnp.float32(mean), jnp.float32(amp2),
                                 jnp.float32(noise), ls))
        got = log_marginal_eig(cache, jnp.float32(mean), jnp.float32(amp2),
                               jnp.float32(noise))
        assert np.isfinite(float(got))
        np.testing.assert_allclose(float(got), float(want), rtol=2e-4,
                                   atol=2e-3)


def test_joint_logprob_matches(problem):
    """Full prior-weighted joint density: eig ≡ chol path."""
    x, y, mask = problem
    ls = jnp.ones(3, jnp.float32)
    cfg = MCMCConfig()
    cache = joint_eig_cache(x, y, mask, ls)
    for vec in [(0.1, 0.8, 1e-3), (0.0, 1.5, 0.02), (0.4, 0.2, 0.3)]:
        v = jnp.array(vec, jnp.float32)
        want = float(_joint_logprob(v, x, y, mask, ls, cfg))
        got = float(_joint_logprob_eig(v, cache, cfg))
        # f32 eigh perturbs near-jitter eigenvalues by ~1e-5·‖M‖, which
        # log-amplifies against small noise — 0.05 absolute on an O(20)
        # logprob is spectral-vs-cholesky roundoff, not a formula error.
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.05)
    # out-of-bounds rejection identical
    bad = jnp.array([0.0, -1.0, 1e-3], jnp.float32)
    assert float(_joint_logprob_eig(bad, cache, cfg)) == -np.inf


def test_sweep_posterior_agrees(problem):
    """Chains run with joint_eig sample the same posterior (moments
    within MC error of the chol-path chains on the same seeds)."""
    x, y, mask = problem
    d = x.shape[1]
    h0 = GPHypers(mean=jnp.float32(0.0), amp2=jnp.float32(1.0),
                  noise=jnp.float32(1e-3), ls=jnp.ones(d, jnp.float32))

    def run(cfg, key, steps=60):
        h = h0
        samples = []
        for k in jax.random.split(key, steps):
            h = sample_hypers(k, h, x, y, mask, cfg)
            samples.append((float(h.amp2), float(h.noise)))
        return np.array(samples[20:])  # drop burn-in

    a = run(MCMCConfig(joint_eig=False), jax.random.PRNGKey(0))
    b = run(MCMCConfig(joint_eig=True), jax.random.PRNGKey(1))
    # medians within loose MC bounds (40 samples each)
    assert np.median(b[:, 0]) < 4 * np.median(a[:, 0]) + 1e-3
    assert np.median(a[:, 0]) < 4 * np.median(b[:, 0]) + 1e-3
    assert np.median(b[:, 1]) < 10 * np.median(a[:, 1]) + 1e-3
    assert np.median(a[:, 1]) < 10 * np.median(b[:, 1]) + 1e-3


def test_identical_trajectory_on_same_seed(problem):
    """At f32 the eig and chol logprobs differ by ~1e-5; on the same key
    the two paths should *usually* take the same accept/reject decisions
    at small n.  We assert the sampled hypers stay close after one sweep
    (not bitwise — slice thresholds can flip on roundoff)."""
    x, y, mask = problem
    d = x.shape[1]
    h0 = GPHypers(mean=jnp.float32(0.05), amp2=jnp.float32(0.9),
                  noise=jnp.float32(5e-3), ls=jnp.ones(d, jnp.float32))
    k = jax.random.PRNGKey(7)
    ha = sample_hypers(k, h0, x, y, mask, MCMCConfig(joint_eig=False))
    hb = sample_hypers(k, h0, x, y, mask, MCMCConfig(joint_eig=True))
    np.testing.assert_allclose(float(ha.amp2), float(hb.amp2), rtol=1e-2)
    np.testing.assert_allclose(float(ha.mean), float(hb.mean), atol=1e-2)
