"""EI-per-second: dual-GP acquisition prefers cheap regions at equal EI."""

import jax
import jax.numpy as jnp
import numpy as np
from argparse import Namespace

from spearmint_tpu.engine.per_sec import suggest_step_per_sec
from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states


def _problem(rng, n=16, pad=16):
    x = rng.rand(n, 2).astype(np.float32)
    # objective symmetric in x0 -> EI roughly equal left/right
    y = (10 * (x[:, 1] - 0.5) ** 2 + 0.05 * rng.randn(n)).astype(np.float32)
    # duration strongly increasing in x0: right half is expensive
    log_d = (5.0 * x[:, 0]).astype(np.float32)
    return x, y, log_d


def test_per_sec_prefers_cheap_side():
    rng = np.random.RandomState(0)
    x, y, log_d = _problem(rng)
    pad = 16
    mask = jnp.ones(pad, bool)
    xj, yj, tj = jnp.array(x), jnp.array(y), jnp.array(log_d)
    cand = rng.rand(64, 2).astype(np.float32)
    cfg = SuggestConfig(mcmc_iters=3, optimize=False)
    h = init_chain_states(yj, mask, 2, chains=4)
    t = init_chain_states(tj, mask, 2, chains=4)
    res = suggest_step_per_sec(
        jax.random.PRNGKey(0), h, t, xj, yj, tj, mask,
        jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
        jnp.array(cand), jnp.ones(64, bool), cfg,
    )
    ei_ps = np.asarray(res.ei_per_s)
    assert np.all(np.isfinite(ei_ps))
    left = ei_ps[cand[:, 0] < 0.4].mean()
    right = ei_ps[cand[:, 0] > 0.6].mean()
    assert left > 3 * right, (left, right)
    # the suggested candidate is on the cheap side
    assert cand[int(res.best_cand), 0] < 0.5


def test_per_sec_chooser_protocol(tmp_path):
    from spearmint_tpu.choosers import get_chooser

    rng = np.random.RandomState(1)
    chooser = get_chooser(
        "GPEIperSecChooser", str(tmp_path),
        "mcmc_iters=2,chains=3,burnin=10,grid_subset=3,lbfgs_iters=8",
    )
    grid = rng.rand(40, 2)
    values = np.full(40, np.nan)
    durs = np.full(40, np.nan)
    complete = np.arange(10)
    values[complete] = rng.randn(10)
    durs[complete] = np.exp(2 * grid[complete, 0])
    candidates = np.arange(10, 40)
    out = chooser.next(grid, values, durs, candidates, [], complete)
    assert isinstance(out, (int, tuple))
    if isinstance(out, tuple):
        ei, pt = out
        assert pt.shape == (2,) and 0 <= pt.min() and pt.max() <= 1
    # state checkpoint includes both hyper sets
    import os
    z = np.load(os.path.join(str(tmp_path), "GPEIperSecChooser_state.npz"))
    assert "time_ls" in z and z["time_ls"].shape == (3, 2)


def test_per_sec_chunked_matches_unchunked():
    """chain_chunk/explicit_inverse (flagship memory policy, threaded
    through in r3) must not change the per-sec acquisition."""
    rng = np.random.RandomState(2)
    x, y, log_d = _problem(rng)
    pad = 16
    mask = jnp.ones(pad, bool)
    xj, yj, tj = jnp.array(x), jnp.array(y), jnp.array(log_d)
    cand = rng.rand(32, 2).astype(np.float32)
    h = init_chain_states(yj, mask, 2, chains=4)
    t = init_chain_states(tj, mask, 2, chains=4)
    args = (jax.random.PRNGKey(3), h, t, xj, yj, tj, mask,
            jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
            jnp.array(cand), jnp.ones(32, bool))
    base = suggest_step_per_sec(
        *args, SuggestConfig(mcmc_iters=2, optimize=False))
    chunked = suggest_step_per_sec(
        *args, SuggestConfig(mcmc_iters=2, optimize=False, chain_chunk=2,
                             explicit_inverse=False))
    np.testing.assert_allclose(np.asarray(base.ei_per_s),
                               np.asarray(chunked.ei_per_s),
                               rtol=2e-4, atol=1e-7)
    assert int(base.best_cand) == int(chunked.best_cand)


def test_per_sec_chunked_with_pending_fantasies():
    """Pending-fantasy path under chain_chunk stays finite and coherent."""
    rng = np.random.RandomState(4)
    x, y, log_d = _problem(rng)
    pad = 16
    mask = jnp.ones(pad, bool)
    xj, yj, tj = jnp.array(x), jnp.array(y), jnp.array(log_d)
    cand = rng.rand(32, 2).astype(np.float32)
    pend = rng.rand(4, 2).astype(np.float32)
    h = init_chain_states(yj, mask, 2, chains=4)
    t = init_chain_states(tj, mask, 2, chains=4)
    cfg = SuggestConfig(mcmc_iters=2, optimize=False, has_pending=True,
                        n_fantasies=5, chain_chunk=2)
    res = suggest_step_per_sec(
        jax.random.PRNGKey(5), h, t, xj, yj, tj, mask,
        jnp.array(pend), jnp.ones(4, bool),
        jnp.array(cand), jnp.ones(32, bool), cfg,
    )
    assert np.all(np.isfinite(np.asarray(res.ei_per_s)))


def test_ei_per_sec_formula_matches_golden_at_fixed_hypers():
    """Deterministic parity: engine EI/sec at one fixed dual
    hyperparameter state equals golden EI / exp(E[log-duration])
    computed independently in float64 NumPy (GPEIperSecChooser's
    compute_ei_per_s, SURVEY.md §2 #4)."""
    from spearmint_tpu.acquire import ei as jei
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.golden import numpy_ref as g

    rng = np.random.RandomState(4)
    n, pad, d, c = 14, 16, 2, 64
    x = rng.rand(n, d)
    y = np.sin(4 * x[:, 0]) + 0.1 * rng.randn(n)
    log_d = 2.0 * x[:, 1] + 0.05 * rng.randn(n)
    cand = rng.rand(c, d)
    hv = dict(mean=float(y.mean()), amp2=1.2, noise=2e-3,
              ls=np.array([0.7, 0.4]))
    ht = dict(mean=float(log_d.mean()), amp2=0.8, noise=1e-3,
              ls=np.array([1.1, 0.6]))

    want_ei = g.compute_ei(x, y, cand, **hv)
    mu_t, _ = g.posterior(x, log_d, cand, **ht)
    want = want_ei / np.maximum(np.exp(mu_t), 1e-3)

    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    tp = np.zeros(pad, np.float32); tp[:n] = log_d
    mask = np.arange(pad) < n
    xj, yj, tj, mj = (jnp.array(xp), jnp.array(yp), jnp.array(tp),
                      jnp.array(mask))
    cj = jnp.array(cand, jnp.float32)

    def H(h):
        return GPHypers(jnp.float32(h["mean"]), jnp.float32(h["amp2"]),
                        jnp.float32(h["noise"]),
                        jnp.array(h["ls"], jnp.float32))

    ei = np.asarray(jei.compute_ei(xj, yj, mj, H(hv), cj, matern52))
    cache_t = jei.make_cache(xj, tj, mj, H(ht), matern52)
    mu = np.asarray(jei.posterior_from_cache(cache_t, xj, mj, cj,
                                             matern52)[0])
    got = ei / np.maximum(np.exp(mu), 1e-3)
    np.testing.assert_allclose(got, want, rtol=3e-3,
                               atol=3e-4 * np.abs(want).max())
    assert int(np.argmax(got)) == int(np.argmax(want))
