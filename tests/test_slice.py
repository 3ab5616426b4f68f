"""Slice sampler distributional tests (SURVEY.md §4: sample a known 1-D
density, KS test) + compwise mode."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from spearmint_tpu.mcmc.slice import slice_sample


def _run_chain(logprob, x0, n, seed=0, **kw):
    key = jax.random.PRNGKey(seed)
    xs = []
    x = jnp.asarray(x0)
    for i in range(n):
        key, k = jax.random.split(key)
        x = slice_sample(k, x, logprob, **kw)
        xs.append(np.asarray(x))
    return np.array(xs)


def test_standard_normal_ks():
    logprob = lambda x: -0.5 * jnp.sum(x**2)
    xs = _run_chain(logprob, np.array([0.0], np.float32), 2000)[500:, 0]
    # thin to reduce autocorrelation
    stat, p = sps.kstest(xs[::5], "norm")
    assert p > 0.01, (stat, p)


def test_exponential_bounded_support():
    # p(x) ∝ exp(-x) on x>0: support constraint via -inf
    logprob = lambda x: jnp.where(x[0] > 0, -x[0], -jnp.inf)
    xs = _run_chain(logprob, np.array([1.0], np.float32), 3000)[500:, 0]
    assert np.all(xs > 0)
    stat, p = sps.kstest(xs[::5], "expon")
    assert p > 0.01, (stat, p)


def test_compwise_2d_gaussian_moments():
    cov = np.array([[1.0, 0.6], [0.6, 1.0]], np.float32)
    prec = jnp.array(np.linalg.inv(cov))
    logprob = lambda x: -0.5 * x @ prec @ x
    xs = _run_chain(logprob, np.zeros(2, np.float32), 4000, compwise=True)[1000:]
    emp = np.cov(xs.T)
    np.testing.assert_allclose(emp, cov, atol=0.15)
    np.testing.assert_allclose(xs.mean(0), 0.0, atol=0.1)


def test_vmap_chains_independent():
    logprob = lambda x: -0.5 * jnp.sum(x**2)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x0 = jnp.zeros((8, 1), jnp.float32)
    step = jax.vmap(lambda k, x: slice_sample(k, x, logprob))
    x = x0
    for i in range(50):
        keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        subkeys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        x = step(subkeys, x)
    x = np.asarray(x)
    # chains decorrelate: all distinct values
    assert len(np.unique(x.round(6))) == 8


def test_lp0_carry_is_exact():
    """Passing lp0 = logprob(x0) (the r3 cross-move carry) must produce
    bit-identical samples to letting the sampler evaluate it."""
    logprob = lambda x: -0.5 * jnp.sum((x - 0.7) ** 2) * 3.0
    for compwise in (False, True):
        for seed in range(4):
            k = jax.random.PRNGKey(seed)
            x0 = jnp.array([0.2, -0.4], jnp.float32)
            a = slice_sample(k, x0, logprob, compwise=compwise)
            b, lp_b = slice_sample(k, x0, logprob, compwise=compwise,
                                   lp0=logprob(x0), with_lp=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # the returned lp is the logprob at the returned point
            np.testing.assert_allclose(float(lp_b), float(logprob(b)),
                                       rtol=1e-5, atol=1e-6)
