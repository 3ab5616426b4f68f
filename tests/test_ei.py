"""EI vs golden NumPy + analytic properties + ∇EI vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from spearmint_tpu.acquire import ei as ei_mod
from spearmint_tpu.acquire import fantasy
from spearmint_tpu.core.likelihood import GPHypers
from spearmint_tpu.golden import numpy_ref


def _setup(rng, n=10, d=2, pad=16):
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)
    xp = np.zeros((pad, d)); xp[:n] = x
    yp = np.zeros(pad); yp[:n] = y
    mask = np.arange(pad) < n
    hyp = dict(mean=float(y.mean()), amp2=1.2, noise=0.01,
               ls=np.abs(rng.randn(d)) + 0.5)
    jh = GPHypers(jnp.float32(hyp["mean"]), jnp.float32(hyp["amp2"]),
                  jnp.float32(hyp["noise"]), jnp.array(hyp["ls"], jnp.float32))
    return x, y, xp, yp, mask, hyp, jh


def test_ei_matches_golden(rng):
    x, y, xp, yp, mask, hyp, jh = _setup(rng)
    cand = rng.rand(20, 2)
    want = numpy_ref.compute_ei(x, y, cand, **hyp)
    got = np.asarray(ei_mod.compute_ei(
        jnp.array(xp), jnp.array(yp), jnp.array(mask), jh,
        jnp.array(cand, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_posterior_matches_golden(rng):
    x, y, xp, yp, mask, hyp, jh = _setup(rng)
    cand = rng.rand(15, 2)
    want_mu, want_var = numpy_ref.posterior(x, y, cand, **hyp)
    cache = ei_mod.make_cache(jnp.array(xp), jnp.array(yp), jnp.array(mask), jh)
    mu, var = ei_mod.posterior_from_cache(
        cache, jnp.array(xp), jnp.array(mask), jnp.array(cand, jnp.float32))
    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), want_var, rtol=1e-2, atol=1e-4)


def test_ei_nonnegative_and_zero_at_observed(rng):
    x, y, xp, yp, mask, hyp, jh = _setup(rng)
    got = np.asarray(ei_mod.compute_ei(
        jnp.array(xp), jnp.array(yp), jnp.array(mask), jh,
        jnp.array(x, jnp.float32)))
    assert np.all(got >= 0)
    # at noise→0, EI at observed non-incumbent points is ~0
    jh0 = GPHypers(jh.mean, jh.amp2, jnp.float32(1e-6), jh.ls)
    got0 = np.asarray(ei_mod.compute_ei(
        jnp.array(xp), jnp.array(yp), jnp.array(mask), jh0,
        jnp.array(x, jnp.float32)))
    assert np.max(got0) < 0.05


def test_grad_ei_vs_finite_diff(rng):
    """The reference's check_grad_ei self-check, via jax.grad (SURVEY §4)."""
    x, y, xp, yp, mask, hyp, jh = _setup(rng)
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)

    def ei_at(pt):
        return ei_mod.compute_ei(xj, yj, mj, jh, pt[None])[0]

    pt = jnp.array(rng.rand(2), jnp.float32)
    g = np.asarray(jax.grad(ei_at)(pt))
    eps = 1e-3
    for i in range(2):
        e = np.zeros(2, np.float32); e[i] = eps
        fd = (float(ei_at(pt + e)) - float(ei_at(pt - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=1e-4)


def test_fantasy_moments(rng):
    """Fantasized outcomes match the golden posterior mean in expectation."""
    x, y, xp, yp, mask, hyp, jh = _setup(rng)
    pend = rng.rand(3, 2)
    pend_pad = np.zeros((4, 2)); pend_pad[:3] = pend
    pend_mask = np.arange(4) < 3
    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    draws = jax.vmap(lambda k: fantasy.fantasize(
        k, jnp.array(xp), jnp.array(yp), jnp.array(mask),
        jnp.array(pend_pad, jnp.float32), jnp.array(pend_mask), jh))(keys)
    draws = np.asarray(draws)[:, :3]
    want_mu, _ = numpy_ref.posterior(x, y, pend, **hyp)
    np.testing.assert_allclose(draws.mean(0), want_mu, atol=0.15)


def test_augment_shapes(rng):
    x, y, xp, yp, mask, hyp, jh = _setup(rng)
    pend = jnp.array(rng.rand(4, 2), jnp.float32)
    pmask = jnp.array([True, True, False, False])
    fant = jnp.zeros(4)
    xa, ya, ma = fantasy.augment(
        jnp.array(xp), jnp.array(yp), jnp.array(mask), pend, pmask, fant)
    assert xa.shape == (20, 2) and ya.shape == (20,) and ma.shape == (20,)
    assert int(ma.sum()) == int(np.sum(mask)) + 2


def test_ei_chunked_at_1m_candidates(rng):
    """sweep1m mechanics (BASELINE config 5 candidate axis): the chunked
    EI sweep handles C=1e6 candidates at small n on CPU, matches the
    unchunked values on a sampled subset, and never materializes the
    full [n, C] solve (peak memory stays O(S·n·chunk))."""
    x, y, xp, yp, mask, hyp, jh = _setup(rng, n=60, d=2, pad=64)
    cache = ei_mod.make_cache(jnp.array(xp, jnp.float32),
                              jnp.array(yp, jnp.float32),
                              jnp.array(mask), jh)
    C = 1_000_000
    cand = jax.random.uniform(jax.random.PRNGKey(0), (C, 2), jnp.float32)
    out = jax.jit(
        lambda c: ei_mod.ei_from_cache_chunked(
            cache, jnp.array(xp, jnp.float32), jnp.array(mask), c)
    )(cand)
    out = np.asarray(out)
    assert out.shape == (C,)
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    # spot-check 1024 random candidates against the direct path
    idx = np.asarray(
        jax.random.choice(jax.random.PRNGKey(1), C, (1024,), replace=False))
    direct = np.asarray(ei_mod.ei_from_cache(
        cache, jnp.array(xp, jnp.float32), jnp.array(mask), cand[idx]))
    np.testing.assert_allclose(out[idx], direct, rtol=1e-4, atol=5e-7)
