"""TPU-only fused-path smoke: golden numerics at the production lowering.

VERDICT r3 next #7: the golden trajectory and parity suite run the CPU
path (small n, fused kernel never engages), so a Mosaic numerics
regression would surface only as a silently worse optimizer.  These
tests run ONLY on a real TPU backend (skipped elsewhere) at pad 1024 —
the smallest shape the fused kernel accepts at the production lowering
(block=512, sub=128, Mosaic, Precision.HIGHEST) — and check the two
quantities every suggestion flows through against float64 golden math:

  * the GP log-marginal (seed + every slice-sampling evaluation:
    core/likelihood.log_marginal → shifted fused kernel);
  * the posterior-cache moments (acquire/ei.make_cache →
    linalg.cache_factor → factor + blocked-inverse kernels) and the
    EI surface / argmax region they produce.

Run with:  SPEARMINT_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py
(tests/conftest.py forces the CPU backend unless that env var is set).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused-path smoke needs a real TPU backend",
)

N, PAD, D = 1000, 1024, 2


@pytest.fixture(scope="module")
def problem():
    from spearmint_tpu.golden.trajectory import branin_unit

    rng = np.random.RandomState(0)
    x = rng.rand(N, D)
    y = np.array([branin_unit(u) for u in x]) + 0.05 * rng.randn(N)
    y = (y - y.mean()) / y.std()
    xp = np.zeros((PAD, D), np.float32); xp[:N] = x
    yp = np.zeros(PAD, np.float32); yp[:N] = y
    mask = np.arange(PAD) < N
    cand = rng.rand(256, D)
    return x, y, xp, yp, mask, cand


def test_fused_path_engages():
    from spearmint_tpu.ops import pallas_gp

    assert pallas_gp.supported(PAD)


def test_log_marginal_matches_f64_golden(problem):
    from spearmint_tpu.core.likelihood import GPHypers, log_marginal
    from spearmint_tpu.golden import numpy_ref as g

    x, y, xp, yp, mask, _ = problem
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    for mean, amp2, noise, ls in [
        (0.0, 1.0, 1e-3, (0.5, 0.8)),
        (0.1, 2.0, 0.05, (1.2, 0.3)),
    ]:
        h = GPHypers(jnp.float32(mean), jnp.float32(amp2),
                     jnp.float32(noise), jnp.array(ls, jnp.float32))
        got = float(jax.jit(log_marginal)(xj, yj, mj, h))
        want = g.log_marginal(x.astype(np.float64), y.astype(np.float64),
                              mean, amp2, noise, np.array(ls))
        # |lp| is O(n); the fused kernel agrees with XLA f32 to ~1e-7
        # rel and f32-vs-f64 conditioning dominates the remainder.
        assert abs(got - want) / abs(want) < 1e-3, (got, want)


def test_posterior_cache_and_ei_match_f64_golden(problem):
    from spearmint_tpu.acquire import ei as jei
    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.golden import numpy_ref as g

    x, y, xp, yp, mask, cand = problem
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    mean, amp2, noise, ls = 0.0, 1.5, 1e-2, (0.6, 0.9)
    h = GPHypers(jnp.float32(mean), jnp.float32(amp2), jnp.float32(noise),
                 jnp.array(ls, jnp.float32))

    @jax.jit
    def engine_ei(cj):
        cache = jei.make_cache(xj, yj, mj, h, matern52, with_inverse=True)
        mu, var = jei.posterior_from_cache(cache, xj, mj, cj, matern52)
        return mu, var, jei.ei_from_cache(cache, xj, mj, cj, matern52)

    mu, var, ei = map(np.asarray, engine_ei(jnp.array(cand, jnp.float32)))
    mu0, var0 = g.posterior(x.astype(np.float64), y.astype(np.float64),
                            cand, mean, amp2, noise, np.array(ls))
    ei0 = g.compute_ei(x.astype(np.float64), y.astype(np.float64), cand,
                       mean, amp2, noise, np.array(ls))
    np.testing.assert_allclose(mu, mu0, rtol=0, atol=5e-3 * np.abs(mu0).max())
    np.testing.assert_allclose(var, var0, rtol=0,
                               atol=5e-3 * np.abs(var0).max())
    # EI region agreement: engine argmax must be a high-EI golden point
    assert ei0[int(np.argmax(ei))] >= 0.8 * ei0.max()


def test_short_suggest_trajectory_improves(problem):
    """Three fused-path suggestions on the Branin surface must keep the
    optimizer sane: finite EI, in-bounds picks, best value improving or
    holding (MC-level trajectory check)."""
    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states, suggest_step,
    )
    from spearmint_tpu.golden.trajectory import branin_unit

    x, y, xp, yp, mask, cand = problem
    assert pad_bucket(N) == PAD
    X = list(x)
    Y = list(y)
    cj = jnp.array(cand, jnp.float32)
    cm = jnp.ones(len(cand), bool)
    cfg = SuggestConfig(mcmc_iters=2, grid_subset=5, lbfgs_iters=10)
    key = jax.random.PRNGKey(7)
    y_mu, y_sd = np.mean([branin_unit(u) for u in x]), np.std(
        [branin_unit(u) for u in x])

    hypers = None
    picks = []
    for step in range(3):
        n = len(Y)
        pad = pad_bucket(n)
        xp2 = np.zeros((pad, D), np.float32); xp2[:n] = np.asarray(X)
        yp2 = np.zeros(pad, np.float32); yp2[:n] = np.asarray(Y)
        mk = np.arange(pad) < n
        xj, yj, mj = jnp.array(xp2), jnp.array(yp2), jnp.array(mk)
        if hypers is None:
            hypers = init_chain_states(yj, mj, D, 10)
        key, k = jax.random.split(key)
        res = suggest_step(k, hypers, xj, yj, mj,
                           jnp.zeros((4, D), jnp.float32),
                           jnp.zeros(4, bool), cj, cm, cfg)
        hypers = res.hypers
        assert np.isfinite(float(res.ei_opt)), step
        pick = (np.asarray(res.x_opt)
                if float(res.ei_opt) > float(res.best_cand_ei)
                else cand[int(res.best_cand)])
        assert np.all(pick >= 0) and np.all(pick <= 1), pick
        picks.append(pick)
        X.append(pick.astype(np.float32))
        Y.append(np.float32((branin_unit(pick) - y_mu) / y_sd))

    # suggestions are distinct points with finite values
    assert len({tuple(np.round(p, 6)) for p in picks}) >= 2


def test_obs_sharded_path_matches_local_on_hardware(problem):
    """The obs-sharded (pod-scale) log-marginal and posterior agree
    with the local fused path on real hardware (1-way obs mesh — the
    virtual-CPU mesh tests never exercised TPU numerics; r4 pinned
    Precision.HIGHEST on the colblock factorization/solve GEMMs)."""
    from spearmint_tpu.acquire import ei as jei
    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.core.likelihood import GPHypers, log_marginal
    from spearmint_tpu.engine import obs_shard as obs

    x, y, xp, yp, mask, cand = problem
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    h = GPHypers(jnp.float32(0.0), jnp.float32(1.3), jnp.float32(1e-3),
                 jnp.array([0.7, 0.4], jnp.float32))
    mesh = obs.make_obs_mesh()

    lp_sh = float(obs.sharded_logprob(mesh)(xj, yj, mj, h.mean, h.amp2,
                                            h.noise, h.ls))
    lp_loc = float(jax.jit(log_marginal)(xj, yj, mj, h))
    assert abs(lp_sh - lp_loc) / abs(lp_loc) < 1e-4, (lp_sh, lp_loc)

    cj = jnp.array(cand, jnp.float32)
    mu_s, var_s = obs.sharded_posterior(mesh)(xj, yj, mj, cj, h.mean,
                                              h.amp2, h.noise, h.ls)

    @jax.jit
    def local_post(c):
        cache = jei.make_cache(xj, yj, mj, h, matern52, with_inverse=True)
        return jei.posterior_from_cache(cache, xj, mj, c, matern52)

    mu_l, var_l = local_post(cj)
    mu_s, var_s, mu_l, var_l = map(np.asarray, (mu_s, var_s, mu_l, var_l))
    assert np.max(np.abs(mu_s - mu_l)) < 5e-3 * np.abs(mu_l).max()
    assert np.max(np.abs(var_s - var_l)) < 5e-2 * np.abs(var_l).max()
    assert var_s.min() > 0


def test_pending_augmented_cache_matches_f64_golden(problem):
    """r5: the pending-fantasy path factors the AUGMENTED (obs∪pend)
    covariance through the fused kernel (engine/suggest per_sample_
    cache → linalg.cache_factor).  Check that route's posterior/EI on
    hardware against float64 golden math with fixed fantasy values —
    the exact class of separately-assembled-refactorization bug the r4
    smoke caught on the no-pending path."""
    from spearmint_tpu.core import linalg
    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.core.likelihood import GPHypers, unit_cov_matrix
    from spearmint_tpu.golden import numpy_ref as g
    from spearmint_tpu.ops import pallas_gp

    x, y, xp, yp, mask, cand = problem
    rng = np.random.RandomState(3)
    p_real, ppad = 64, 128          # chooser pads pending 128-aligned
    pend = rng.rand(p_real, D)
    pend_p = np.zeros((ppad, D), np.float32); pend_p[:p_real] = pend
    pend_mask = np.arange(ppad) < p_real
    fant = (0.3 * rng.randn(p_real)).astype(np.float64)  # fixed draws

    aug_pad = PAD + ppad
    assert pallas_gp.supported(aug_pad)  # 1152 = 9·128

    x_aug = np.concatenate([xp, pend_p])
    y_aug = np.zeros(aug_pad, np.float32)
    y_aug[:N] = yp[:N]; y_aug[PAD:PAD + p_real] = fant
    m_aug = np.concatenate([mask, pend_mask])

    mean, amp2, noise, ls = 0.05, 1.2, 5e-3, (0.7, 0.5)
    h = GPHypers(jnp.float32(mean), jnp.float32(amp2), jnp.float32(noise),
                 jnp.array(ls, jnp.float32))

    @jax.jit
    def aug_ei(cj):
        from spearmint_tpu.acquire import ei as jei

        xa, ya, ma = (jnp.array(x_aug), jnp.array(y_aug),
                      jnp.array(m_aug))
        m0 = unit_cov_matrix(xa, ma, h.ls, matern52)
        dadd = jnp.where(ma, h.noise, 1.0)
        resid = jnp.where(ma, ya - h.mean, 0.0)
        chol, linv, alpha = linalg.cache_factor(
            m0, jnp.float32(amp2), dadd, resid)
        cache = jei.PosteriorCache(
            chol=chol, alpha=alpha,
            best=linalg.masked_min(ya, ma), hypers=h, linv=linv)
        mu, var = jei.posterior_from_cache(cache, xa, ma, cj, matern52)
        return mu, var, jei.ei_from_cache(cache, xa, ma, cj, matern52)

    mu, var, ei = map(np.asarray, aug_ei(jnp.array(cand, jnp.float32)))
    x64 = np.concatenate([x.astype(np.float64), pend])
    y64 = np.concatenate([y.astype(np.float64), fant])
    mu0, var0 = g.posterior(x64, y64, cand, mean, amp2, noise,
                            np.array(ls))
    ei0 = g.compute_ei(x64, y64, cand, mean, amp2, noise, np.array(ls))
    assert np.isfinite(mu).all() and np.isfinite(var).all()
    np.testing.assert_allclose(mu, mu0, rtol=0,
                               atol=5e-3 * np.abs(mu0).max())
    np.testing.assert_allclose(var, var0, rtol=0,
                               atol=5e-3 * np.abs(var0).max())
    assert ei0[int(np.argmax(ei))] >= 0.8 * ei0.max()


def test_fantasize_batch_moments_match_f64_golden(problem):
    """fantasize_batch now factors the obs covariance through the
    fused kernel (acquire/fantasy.py, r5): on hardware its draws'
    moments must match the float64 golden pending posterior."""
    from spearmint_tpu.acquire.fantasy import fantasize_batch
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.golden import numpy_ref as g
    import scipy.linalg as spla

    x, y, xp, yp, mask, _ = problem
    rng = np.random.RandomState(5)
    p_real, ppad = 16, 16
    pend = rng.rand(p_real, D)
    mean, amp2, noise, ls = 0.0, 1.0, 1e-2, (0.6, 0.9)
    h = GPHypers(jnp.float32(mean), jnp.float32(amp2), jnp.float32(noise),
                 jnp.array(ls, jnp.float32))
    F = 512
    fants = np.asarray(fantasize_batch(
        jax.random.PRNGKey(2), jnp.array(xp), jnp.array(yp),
        jnp.array(mask), jnp.array(pend, jnp.float32),
        jnp.ones(ppad, bool), h, F))
    assert np.isfinite(fants).all()
    # golden pending posterior (mean + marginal variances)
    x64, y64 = x.astype(np.float64), y.astype(np.float64)
    mu0, var_full = g.posterior(x64, y64, pend, mean, amp2, noise,
                                np.array(ls))
    emp_mean = fants.mean(axis=0)
    emp_var = fants.var(axis=0)
    # MC error at F=512: se(mean) ≈ σ/√F, se(var) ≈ var·√(2/F)
    se = np.sqrt(np.maximum(var_full, 1e-10) / F)
    assert np.all(np.abs(emp_mean - mu0) < 5 * se + 1e-3)
    np.testing.assert_allclose(emp_var, var_full, rtol=0.35, atol=1e-4)
