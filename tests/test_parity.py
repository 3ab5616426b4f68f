"""Golden parity: JAX MCMC posterior moments vs the NumPy re-derivation
within Monte-Carlo error (BASELINE.json north-star requirement;
SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.core.likelihood import GPHypers
from spearmint_tpu.golden import numpy_ref
from spearmint_tpu.mcmc.chains import MCMCConfig, init_hypers, sample_hypers
from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states, suggest_step


def _data(n=30, d=2, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, d)
    y = np.sin(4 * x[:, 0]) * np.cos(3 * x[:, 1]) + 0.05 * rng.randn(n)
    return x.astype(np.float32), (y - y.mean()).astype(np.float32)


def _pad(x, y, pad):
    xp = np.zeros((pad, x.shape[1]), np.float32); xp[:len(x)] = x
    yp = np.zeros(pad, np.float32); yp[:len(y)] = y
    return jnp.array(xp), jnp.array(yp), jnp.array(np.arange(pad) < len(x))


@pytest.mark.slow
def test_posterior_moments_match_golden():
    """At n=30, noise and length scales are tightly identified and must
    match closely.  amp2 is long-tailed with a random-direction joint
    move whose step size is throttled by the sharp noise axis: measured
    single-chain medians over 1000-sample golden blocks wander between
    0.68 and 2.27 on this posterior, so the amp2 check uses long runs,
    a wide median band, and IQR overlap — a genuine systematic bias
    (wrong prior, wrong likelihood) still fails it."""
    x, y = _data()
    xj, yj, mask = _pad(x, y, 32)

    # golden: single chain, long run
    gp = numpy_ref.GoldenGP(2, y, seed=0)
    g_samples = []
    for i in range(3000):
        g_samples.append(gp.sample_hypers(x, y.astype(float)))
    g_samples = g_samples[600:]
    g_amp2 = np.array([s[1] for s in g_samples])
    g_noise = np.array([s[2] for s in g_samples])
    g_ls = np.array([s[3] for s in g_samples])

    # jax: 8 chains × 500 post-burnin sweeps
    cfg = MCMCConfig()
    h = init_chain_states(yj, mask, 2, chains=8)
    step = jax.jit(jax.vmap(
        lambda k, hh: sample_hypers(k, hh, xj, yj, mask, cfg)))
    key = jax.random.PRNGKey(0)
    samples = []
    for i in range(650):
        key, k = jax.random.split(key)
        h = step(jax.random.split(k, 8), h)
        if i >= 150:
            samples.append(jax.tree.map(np.asarray, h))
    j_amp2 = np.concatenate([s.amp2 for s in samples])
    j_noise = np.concatenate([s.noise for s in samples])
    j_ls = np.concatenate([s.ls.reshape(-1, 2) for s in samples])

    # noise and length scales are tightly identified
    assert abs(np.log(np.median(j_noise)) - np.log(np.median(g_noise))) < np.log(3)
    np.testing.assert_allclose(np.median(j_ls, 0), np.median(g_ls, 0), atol=0.4)
    # amp2: medians within the measured block-to-block wander (3.5×)
    # and overlapping IQRs
    assert abs(np.log(np.median(j_amp2)) - np.log(np.median(g_amp2))) < np.log(3.5)
    j_lo, j_hi = np.percentile(j_amp2, [25, 75])
    g_lo, g_hi = np.percentile(g_amp2, [25, 75])
    assert j_lo < g_hi and g_lo < j_hi


@pytest.mark.slow
def test_suggestion_agrees_with_golden_trajectory():
    """Same data → EI argmax lands in the same region as golden
    (exact index equality is not expected: different RNG streams)."""
    x, y = _data(seed=5)
    rng = np.random.RandomState(11)
    cand = rng.rand(64, 2).astype(np.float32)

    g_idx, g_ei, _ = numpy_ref.suggest(
        x.astype(float), y.astype(float), cand.astype(float),
        mcmc_iters=30, seed=1, burnin=50)

    xj, yj, mask = _pad(x, y, 32)
    cfg = SuggestConfig(mcmc_iters=10, optimize=False)
    h = init_chain_states(yj, mask, 2, chains=6)
    # burn-in: a few warm-up calls
    key = jax.random.PRNGKey(2)
    for i in range(4):
        key, k = jax.random.split(key)
        res = suggest_step(k, h, xj, yj, mask,
                           jnp.zeros((4, 2), jnp.float32),
                           jnp.zeros(4, bool),
                           jnp.array(cand), jnp.ones(64, bool), cfg)
        h = res.hypers
    j_ei = np.asarray(res.ei)

    # EI landscapes correlate strongly
    corr = np.corrcoef(j_ei, g_ei)[0, 1]
    assert corr > 0.8, corr
    # jax argmax is near-optimal under the golden EI landscape
    assert g_ei[int(res.best_cand)] >= 0.5 * g_ei.max()
