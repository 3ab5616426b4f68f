"""Constrained EI: ESS sampler correctness + feasibility weighting steers
suggestions away from the violating region."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from spearmint_tpu.engine.constrained import (
    init_constraint_states,
    suggest_step_constrained,
)
from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states
from spearmint_tpu.mcmc.ess import elliptical_slice


def test_ess_samples_gaussian_posterior():
    """Prior N(0, I), likelihood N(obs | f, s²) → known Gaussian posterior."""
    n = 3
    obs = jnp.array([1.0, -0.5, 2.0])
    s2 = 0.5
    chol = jnp.eye(n)

    def log_lik(f):
        return -0.5 * jnp.sum((obs - f) ** 2) / s2

    key = jax.random.PRNGKey(0)
    f = jnp.zeros(n)
    samples = []
    step = jax.jit(lambda k, f: elliptical_slice(k, f, chol, log_lik))
    for i in range(3000):
        key, k = jax.random.split(key)
        f = step(k, f)
        if i >= 500:
            samples.append(np.asarray(f))
    samples = np.array(samples)
    # posterior: mean = obs/(1+s2), var = s2/(1+s2)
    want_mean = np.asarray(obs) / (1 + s2)
    want_std = np.sqrt(s2 / (1 + s2))
    np.testing.assert_allclose(samples.mean(0), want_mean, atol=0.1)
    np.testing.assert_allclose(samples.std(0), want_std, atol=0.1)
    # distributional check on one coordinate
    _, p = sps.kstest((samples[::10, 0] - want_mean[0]) / want_std, "norm")
    assert p > 0.005, p


def test_constrained_avoids_violating_region():
    rng = np.random.RandomState(0)
    n, pad = 24, 32
    x = rng.rand(n, 2).astype(np.float32)
    # objective improves toward x0=1, but x0>0.6 is infeasible (NaN)
    valid = x[:, 0] <= 0.6
    y_raw = 5.0 * (1.0 - x[:, 0]) + 0.05 * rng.randn(n)
    y = np.where(valid, y_raw, 0.0).astype(np.float32)

    xp = np.zeros((pad, 2), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    obs_mask = np.arange(pad) < n
    valid_mask = np.zeros(pad, bool); valid_mask[:n] = valid

    cand = rng.rand(64, 2).astype(np.float32)
    cfg = SuggestConfig(mcmc_iters=3, optimize=False)
    h = init_chain_states(jnp.array(yp), jnp.array(valid_mask), 2, chains=4)
    c = init_constraint_states(2, pad, chains=4)
    res = suggest_step_constrained(
        jax.random.PRNGKey(0), h, c, jnp.array(xp), jnp.array(yp),
        jnp.array(valid_mask), jnp.array(obs_mask),
        jnp.array(cand), jnp.ones(64, bool), cfg,
    )
    pv = np.asarray(res.p_valid)
    assert np.all(np.isfinite(pv)) and np.all((pv >= 0) & (pv <= 1))
    # classifier learned the split
    assert pv[cand[:, 0] < 0.4].mean() > pv[cand[:, 0] > 0.8].mean() + 0.15
    # suggestion respects feasibility: not deep in the violating region
    assert cand[int(res.best_cand), 0] < 0.8


def test_constrained_chooser_protocol(tmp_path):
    from spearmint_tpu.choosers import get_chooser

    rng = np.random.RandomState(1)
    chooser = get_chooser(
        "GPConstrainedEIChooser", str(tmp_path),
        "mcmc_iters=2,chains=3,burnin=10,grid_subset=3,lbfgs_iters=8",
    )
    grid = rng.rand(40, 2)
    values = np.full(40, np.nan)
    complete = np.arange(12)
    vals = 2.0 * grid[complete, 1] + 0.1 * rng.randn(12)
    vals[grid[complete, 0] > 0.5] = np.nan  # violations
    values[complete] = vals
    candidates = np.arange(12, 40)
    out = chooser.next(grid, values, np.full(40, np.nan), candidates, [],
                       complete)
    assert isinstance(out, (int, tuple))


def _constrained_problem(rng, n_grid=40, n_comp=12):
    grid = rng.rand(n_grid, 2)
    values = np.full(n_grid, np.nan)
    complete = np.arange(n_comp)
    vals = 2.0 * grid[complete, 1] + 0.1 * rng.randn(n_comp)
    vals[grid[complete, 0] > 0.5] = np.nan  # violations
    values[complete] = vals
    candidates = np.arange(n_comp, n_grid)
    return grid, values, candidates, complete


def test_constrained_samples_amp2_and_persists_state(tmp_path):
    """Constraint amp2 must be slice-sampled (not frozen at 1.0) and the
    whole ConstraintState must survive a chooser restart (the reference
    pickles all chooser state, SURVEY.md §5.4)."""
    import os

    from spearmint_tpu.choosers import get_chooser

    rng = np.random.RandomState(2)
    args = "mcmc_iters=4,chains=3,burnin=15,grid_subset=3,lbfgs_iters=8"
    chooser = get_chooser("GPConstrainedEIChooser", str(tmp_path), args)
    grid, values, candidates, complete = _constrained_problem(rng)
    chooser.next(grid, values, np.full(40, np.nan), candidates, [], complete)

    state_path = os.path.join(str(tmp_path), "GPConstrainedEIChooser_state.npz")
    with np.load(state_path) as z:
        assert "c_ls" in z and "c_amp2" in z and "c_ff" in z
        c_amp2 = z["c_amp2"].copy()
        c_ff = z["c_ff"].copy()
        c_ls = z["c_ls"].copy()
    # amp2 sampled: chains moved off the 1.0 init (burn-in + sweeps)
    assert c_amp2.shape == (3,)
    assert np.any(np.abs(c_amp2 - 1.0) > 1e-3), c_amp2
    # latents moved off zero for real observations
    assert np.any(np.abs(c_ff[:, :12]) > 1e-3)

    # restart: a fresh chooser resumes the latent chains, not zeros
    chooser2 = get_chooser("GPConstrainedEIChooser", str(tmp_path), args)
    chooser2._load_state(2)
    assert chooser2._constraint is not None
    assert chooser2._burned_in
    np.testing.assert_array_equal(np.asarray(chooser2._constraint.ff), c_ff)
    np.testing.assert_array_equal(np.asarray(chooser2._constraint.amp2),
                                  c_amp2)
    np.testing.assert_array_equal(np.asarray(chooser2._constraint.ls), c_ls)
    # and the resumed chooser keeps suggesting (state advances, no re-burn)
    out = chooser2.next(grid, values, np.full(40, np.nan), candidates, [],
                        complete)
    assert isinstance(out, (int, tuple))
    with np.load(state_path) as z2:
        assert not np.array_equal(z2["c_ff"], c_ff)  # chains advanced


def test_constrained_chunked_matches_unchunked():
    """chain_chunk/explicit_inverse (flagship memory policy, threaded
    through in r3) must not change the constrained acquisition."""
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.engine.constrained import (
        init_constraint_states, suggest_step_constrained,
    )
    from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states

    rng = np.random.RandomState(6)
    n, pad = 14, 16
    x = rng.rand(n, 2).astype(np.float32)
    vals = (x[:, 0] ** 2 + 0.05 * rng.randn(n)).astype(np.float64)
    vals[x[:, 1] > 0.7] = np.nan  # violations
    xp = np.zeros((pad, 2), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32)
    valid = np.zeros(pad, bool); valid[:n] = np.isfinite(vals)
    yp[:n] = np.where(np.isfinite(vals), vals, 0.0)
    obs = np.arange(pad) < n
    cand = rng.rand(32, 2).astype(np.float32)
    xj, yj = jnp.array(xp), jnp.array(yp)
    vm, om = jnp.array(valid), jnp.array(obs)
    h = init_chain_states(yj, vm, 2, chains=4)
    c0 = init_constraint_states(2, pad, chains=4)
    args = (jax.random.PRNGKey(7), h, c0, xj, yj, vm, om,
            jnp.array(cand), jnp.ones(32, bool))
    base = suggest_step_constrained(
        *args, SuggestConfig(mcmc_iters=2, optimize=False))
    chunked = suggest_step_constrained(
        *args, SuggestConfig(mcmc_iters=2, optimize=False, chain_chunk=2,
                             explicit_inverse=False))
    np.testing.assert_allclose(np.asarray(base.acq),
                               np.asarray(chunked.acq),
                               rtol=2e-4, atol=1e-7)
    assert int(base.best_cand) == int(chunked.best_cand)


def test_constrained_acquisition_formula_matches_golden_at_fixed_state():
    """Deterministic parity: the probit-weighted acquisition
    EI_valid(x)·Φ(μ_f/√(1+σ²_f)) at one fixed (value hypers, constraint
    state) equals the independently computed float64 NumPy formula."""
    import scipy.linalg as spla

    from spearmint_tpu.acquire import ei as jei
    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.engine.constrained import (
        ConstraintState, _p_valid_at,
    )
    from spearmint_tpu.golden import numpy_ref as g

    rng = np.random.RandomState(9)
    n, pad, d, c = 13, 16, 2, 48
    x = rng.rand(n, d)
    valid = rng.rand(n) > 0.4
    y = np.where(valid, np.sin(4 * x[:, 0]) + 0.1 * rng.randn(n), 0.0)
    ff = np.where(valid, np.abs(rng.randn(n)), -np.abs(rng.randn(n)))
    cand = rng.rand(c, d)
    amp2_c, ls_c = 1.4, np.array([0.8, 0.5])
    hv = dict(mean=float(y[valid].mean()), amp2=1.1, noise=5e-3,
              ls=np.array([0.6, 0.9]))

    # golden: EI on valid observations only
    want_ei = g.compute_ei(x[valid], y[valid], cand, **hv)
    # golden: probit feasibility from the latent GP over ALL points
    kcc = amp2_c * (g.matern52(x, x, ls_c) + 1e-6 * np.eye(n))
    kxc = amp2_c * g.matern52(x, cand, ls_c)
    chol = spla.cholesky(kcc, lower=True)
    alpha = spla.cho_solve((chol, True), ff)
    mu_f = kxc.T @ alpha
    beta = spla.solve_triangular(chol, kxc, lower=True)
    var_f = amp2_c * (1 + 1e-6) - (beta ** 2).sum(0)
    want_pv = sps.norm.cdf(mu_f / np.sqrt(1.0 + np.maximum(var_f, 1e-10)))
    want = want_ei * want_pv

    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    ffp = np.zeros(pad, np.float32); ffp[:n] = ff
    obs = np.arange(pad) < n
    vmask = np.zeros(pad, bool); vmask[:n] = valid
    xj, yj = jnp.array(xp), jnp.array(yp)
    cj = jnp.array(cand, jnp.float32)
    hyp = GPHypers(jnp.float32(hv["mean"]), jnp.float32(hv["amp2"]),
                   jnp.float32(hv["noise"]),
                   jnp.array(hv["ls"], jnp.float32))
    state = ConstraintState(ls=jnp.array(ls_c, jnp.float32),
                            amp2=jnp.float32(amp2_c),
                            ff=jnp.array(ffp))

    ei = np.asarray(jei.compute_ei(xj, yj, jnp.array(vmask), hyp, cj,
                                   matern52))
    pv = np.asarray(_p_valid_at(state, xj, jnp.array(obs), cj, matern52))
    got = ei * pv
    np.testing.assert_allclose(pv, want_pv, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got, want, rtol=5e-3,
                               atol=5e-4 * np.abs(want).max())


def test_golden_constrained_model_learns_labels():
    """The golden probit-constraint oracle (the constrained bench
    denominator, VERDICT r4 next #6) must actually classify: latents
    track structured labels and the probit predictive separates the
    valid from the invalid region."""
    from spearmint_tpu.golden import numpy_ref as g

    rng = np.random.RandomState(0)
    n, d = 60, 2
    x = rng.rand(n, d)
    z = np.where(x[:, 0] > 0.4, 1.0, -1.0)
    cgp = g.GoldenConstrainedGP(d, n, seed=1)
    for _ in range(20):
        _, amp2, ff = cgp.sample_constraint(x, z)
    assert np.corrcoef(ff, z)[0, 1] > 0.5
    assert amp2 > 0
    pv = cgp.p_valid(x, x)
    assert pv[z > 0].mean() > pv[z < 0].mean() + 0.2
    # factorization accounting used by the bench denominator
    assert cgp.chol_count >= 20 * 3  # >= (ESS + >=1 ls eval + amp2)/sweep


def test_constrained_baseline_calibration_smoke():
    from bench import time_baseline_constrained

    b, det = time_baseline_constrained(120, 2, 64, mcmc_iters=2)
    assert b > 0 and np.isfinite(b)
    assert det["constraint_chols_per_sweep"] > 2
    lo, hi = det["range_s"]
    assert lo <= b <= hi or np.isclose(lo, b)
