"""Pure-NumPy golden re-derivation of the reference chooser math.

This module is an *independent CPU implementation* of the algorithms in
``GPEIOptChooser`` (SURVEY.md §3.2) written from the math, not from the
reference source (which was unavailable — see SURVEY.md provenance
caveat).  It serves two purposes:

  1. golden parity tests: the JAX/TPU engine must reproduce these
     posterior moments and EI values (tests/test_parity.py);
  2. the CPU baseline timed by ``bench.py`` (the reference is CPU
     NumPy/SciPy with the same asymptotic cost profile: repeated O(n³)
     Cholesky per slice-sampling likelihood eval, O(n²·C) EI sweeps).

Everything is float64 NumPy, single chain, sequential — the reference's
execution model.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as spla
import scipy.stats as sps

JITTER = 1e-6
NOISE_SCALE = 0.1
AMP2_SCALE = 1.0
MAX_LS = 2.0
DEFAULT_NOISE = 1e-3


# ----------------------------------------------------------------- kernels
def ard_sqdist(x1, x2, ls):
    a = x1 / ls
    b = x2 / ls
    diff = a[:, None, :] - b[None, :, :]
    return np.maximum(np.sum(diff * diff, axis=-1), 0.0)


def matern52(x1, x2, ls):
    r2 = ard_sqdist(x1, x2, ls)
    r = np.sqrt(r2)
    s5 = np.sqrt(5.0)
    return (1.0 + s5 * r + (5.0 / 3.0) * r2) * np.exp(-s5 * r)


# ------------------------------------------------------------ log marginal
def log_marginal(x, y, mean, amp2, noise, ls):
    n = x.shape[0]
    cov = amp2 * (matern52(x, x, ls) + JITTER * np.eye(n)) + noise * np.eye(n)
    try:
        chol = spla.cholesky(cov, lower=True)
    except spla.LinAlgError:
        return -np.inf
    resid = y - mean
    solve = spla.cho_solve((chol, True), resid)
    return -np.sum(np.log(np.diag(chol))) - 0.5 * np.dot(resid, solve)


# ------------------------------------------------------------ slice sampler
def slice_sample(init_x, logprob, rng, sigma=1.0, step_out=True,
                 max_steps_out=1000, compwise=False):
    """Neal (2003) stepping-out/shrinking slice sampler, reference flavor."""

    def direction_slice(direction, cur_x):
        def dir_logprob(z):
            return logprob(cur_x + direction * z)

        upper = sigma * rng.rand()
        lower = upper - sigma
        llh_s = np.log(rng.rand()) + dir_logprob(0.0)

        if step_out:
            steps = 0
            while dir_logprob(lower) > llh_s and steps < max_steps_out:
                lower -= sigma
                steps += 1
            steps = 0
            while dir_logprob(upper) > llh_s and steps < max_steps_out:
                upper += sigma
                steps += 1

        while True:
            new_z = lower + (upper - lower) * rng.rand()
            new_llh = dir_logprob(new_z)
            if np.isnan(new_llh):
                raise FloatingPointError("slice sampler hit NaN log density")
            if new_llh > llh_s:
                return cur_x + direction * new_z
            elif new_z < 0:
                lower = new_z
            else:
                upper = new_z

    init_x = np.asarray(init_x, dtype=float)
    if compwise:
        ordering = rng.permutation(init_x.shape[0])
        x = init_x.copy()
        for d in ordering:
            direction = np.zeros(init_x.shape[0])
            direction[d] = 1.0
            x = direction_slice(direction, x)
        return x
    else:
        direction = rng.randn(init_x.shape[0])
        direction /= np.sqrt(np.sum(direction**2))
        return direction_slice(direction, init_x)


# -------------------------------------------------------- hyper sampling
class GoldenGP:
    """Single-chain fully-Bayesian GP state (reference chooser semantics)."""

    def __init__(self, ndim, vals, noiseless=False, max_ls=MAX_LS, seed=0):
        self.ndim = ndim
        self.noiseless = noiseless
        self.max_ls = max_ls
        self.ls = np.ones(ndim)
        self.mean = float(np.mean(vals))
        self.amp2 = float(np.std(vals)) + 1e-4
        self.noise = DEFAULT_NOISE
        self.rng = np.random.RandomState(seed)

    def _joint_logprob(self, hypers, comp, vals):
        mean = hypers[0]
        amp2 = hypers[1]
        noise = DEFAULT_NOISE if self.noiseless else hypers[2]
        if mean > np.max(vals) or mean < np.min(vals):
            return -np.inf
        if amp2 <= 0 or noise <= 0:
            return -np.inf
        lp = log_marginal(comp, vals, mean, amp2, noise, self.ls)
        lp -= 0.5 * (np.log(np.sqrt(amp2)) / AMP2_SCALE) ** 2
        if not self.noiseless:
            lp += np.log(np.log(1.0 + (NOISE_SCALE / noise) ** 2))
        return lp

    def _ls_logprob(self, ls, comp, vals):
        if np.any(ls <= 0) or np.any(ls > self.max_ls):
            return -np.inf
        return log_marginal(comp, vals, self.mean, self.amp2, self.noise, ls)

    def sample_hypers(self, comp, vals):
        if self.noiseless:
            hypers = slice_sample(
                np.array([self.mean, self.amp2]),
                lambda h: self._joint_logprob(h, comp, vals),
                self.rng,
            )
            self.mean, self.amp2 = float(hypers[0]), float(hypers[1])
            self.noise = DEFAULT_NOISE
        else:
            hypers = slice_sample(
                np.array([self.mean, self.amp2, self.noise]),
                lambda h: self._joint_logprob(h, comp, vals),
                self.rng,
            )
            self.mean, self.amp2, self.noise = (
                float(hypers[0]), float(hypers[1]), float(hypers[2]),
            )
        self.ls = slice_sample(
            self.ls, lambda ls: self._ls_logprob(ls, comp, vals), self.rng,
            compwise=True,
        )
        return (self.mean, self.amp2, self.noise, self.ls.copy())


# ------------------------------------------------------------------- EI
def posterior(comp, vals, cand, mean, amp2, noise, ls):
    n = comp.shape[0]
    obs_cov = amp2 * (matern52(comp, comp, ls) + JITTER * np.eye(n)) + (
        noise * np.eye(n)
    )
    obs_chol = spla.cholesky(obs_cov, lower=True)
    kx = amp2 * matern52(comp, cand, ls)
    alpha = spla.cho_solve((obs_chol, True), vals - mean)
    mu = mean + kx.T @ alpha
    beta = spla.solve_triangular(obs_chol, kx, lower=True)
    var = amp2 * (1.0 + JITTER) - np.sum(beta * beta, axis=0)
    return mu, var


def compute_ei(comp, vals, cand, mean, amp2, noise, ls):
    best = np.min(vals)
    mu, var = posterior(comp, vals, cand, mean, amp2, noise, ls)
    sigma = np.sqrt(np.maximum(var, 1e-14))
    u = (best - mu) / sigma
    return sigma * (u * sps.norm.cdf(u) + sps.norm.pdf(u))


def fantasize(comp, vals, pend, mean, amp2, noise, ls, rng):
    n = comp.shape[0]
    p = pend.shape[0]
    obs_cov = amp2 * (matern52(comp, comp, ls) + JITTER * np.eye(n)) + (
        noise * np.eye(n)
    )
    obs_chol = spla.cholesky(obs_cov, lower=True)
    kx = amp2 * matern52(comp, pend, ls)
    alpha = spla.cho_solve((obs_chol, True), vals - mean)
    pend_m = mean + kx.T @ alpha
    beta = spla.solve_triangular(obs_chol, kx, lower=True)
    kappa = amp2 * (matern52(pend, pend, ls) + JITTER * np.eye(p))
    pend_k = kappa - beta.T @ beta
    pend_chol = spla.cholesky(pend_k + JITTER * np.eye(p), lower=True)
    return pend_m + pend_chol @ rng.randn(p)


def suggest(comp, vals, cand, mcmc_iters=10, noiseless=False, seed=0,
            burnin=0, pend=None):
    """One reference-style suggestion: MCMC sweep + averaged EI argmax."""
    gp = GoldenGP(comp.shape[1], vals, noiseless=noiseless, seed=seed)
    for _ in range(burnin):
        gp.sample_hypers(comp, vals)
    ei_sum = np.zeros(cand.shape[0])
    samples = []
    for _ in range(mcmc_iters):
        samples.append(gp.sample_hypers(comp, vals))
        mean, amp2, noise, ls = samples[-1]
        if pend is not None and len(pend):
            fant = fantasize(comp, vals, pend, mean, amp2, noise, ls, gp.rng)
            comp_aug = np.vstack([comp, pend])
            vals_aug = np.concatenate([vals, fant])
            ei_sum += compute_ei(comp_aug, vals_aug, cand, mean, amp2, noise, ls)
        else:
            ei_sum += compute_ei(comp, vals, cand, mean, amp2, noise, ls)
    ei_mean = ei_sum / mcmc_iters
    return int(np.argmax(ei_mean)), ei_mean, samples


# ----------------------------------------------- constrained (probit) model
def elliptical_slice(f, chol, loglik, rng):
    """Murray/Adams/MacKay (2010) elliptical slice sampling, one move.

    Golden counterpart of mcmc/ess.py for the constraint chooser's
    latent probit GP (engine/constrained.py): prior draw ν ~ N(0, K)
    via the supplied Cholesky, then shrink on the ellipse."""
    nu = chol @ rng.randn(f.shape[0])
    log_y = loglik(f) + np.log(rng.rand())
    theta = rng.rand() * 2.0 * np.pi
    lo, hi = theta - 2.0 * np.pi, theta
    while True:
        fp = f * np.cos(theta) + nu * np.sin(theta)
        if loglik(fp) > log_y:
            return fp
        if theta < 0:
            lo = theta
        else:
            hi = theta
        theta = lo + (hi - lo) * rng.rand()


def probit_loglik(f, z):
    """Σ log Φ(z·f) — the constraint classifier likelihood."""
    return float(np.sum(sps.norm.logcdf(z * f)))


class GoldenConstrainedGP:
    """Single-chain constrained-EI constraint model (CPU float64).

    Mirrors engine/constrained.py's per-sweep structure — ESS latent
    moves under one prior factorization, a compwise ls slice move whose
    every evaluation refactors the n×n constraint covariance, and a
    closed-form amp2 move off one unit-covariance factorization — so
    bench.py can count the O(n³) factorizations per sweep the same way
    _count_eval_calls does for the value GP."""

    def __init__(self, ndim, n, max_ls=MAX_LS, seed=0):
        self.ndim = ndim
        self.max_ls = max_ls
        self.ls = np.ones(ndim)
        self.amp2 = 1.0
        self.ff = np.zeros(n)
        self.rng = np.random.RandomState(seed)
        self.chol_count = 0   # O(n³) factorizations, cumulative

    def _cov(self, x, ls=None, amp2=None):
        ls = self.ls if ls is None else ls
        amp2 = self.amp2 if amp2 is None else amp2
        n = x.shape[0]
        return amp2 * (matern52(x, x, ls) + JITTER * np.eye(n))

    def sample_constraint(self, x, z, ess_sweeps=4):
        # latent ESS moves share one prior factorization
        chol = spla.cholesky(self._cov(x), lower=True)
        self.chol_count += 1
        for _ in range(ess_sweeps):
            self.ff = elliptical_slice(
                self.ff, chol, lambda f: probit_loglik(f, z), self.rng)

        def ls_logprob(ls):
            if np.any(ls <= 0) or np.any(ls > self.max_ls):
                return -np.inf
            c = spla.cholesky(self._cov(x, ls=ls), lower=True)
            self.chol_count += 1
            w = spla.solve_triangular(c, self.ff, lower=True)
            return -np.sum(np.log(np.diag(c))) - 0.5 * np.dot(w, w)

        self.ls = slice_sample(self.ls, ls_logprob, self.rng,
                               compwise=True)

        # amp2: every slice eval closed-form off ONE unit factorization
        unit_chol = spla.cholesky(self._cov(x, amp2=1.0), lower=True)
        self.chol_count += 1
        wu = spla.solve_triangular(unit_chol, self.ff, lower=True)
        quad = np.dot(wu, wu)
        half_logdet = np.sum(np.log(np.diag(unit_chol)))
        n_eff = x.shape[0]

        def amp2_logprob(a_vec):
            a = a_vec[0]
            if a <= 0:
                return -np.inf
            return (-0.5 * n_eff * np.log(a) - half_logdet
                    - 0.5 * quad / a
                    - 0.5 * (np.log(np.sqrt(a)) / AMP2_SCALE) ** 2)

        self.amp2 = float(slice_sample(np.array([self.amp2]),
                                       amp2_logprob, self.rng,
                                       compwise=True)[0])
        return self.ls, self.amp2, self.ff

    def p_valid(self, x, cand):
        """Probit predictive feasibility Φ(μ/√(1+σ²)) at candidates."""
        chol = spla.cholesky(self._cov(x), lower=True)
        alpha = spla.cho_solve((chol, True), self.ff)
        kx = self.amp2 * matern52(x, cand, self.ls)
        mu = kx.T @ alpha
        beta = spla.solve_triangular(chol, kx, lower=True)
        var = self.amp2 * (1.0 + JITTER) - np.sum(beta * beta, axis=0)
        var = np.maximum(var, 1e-10)
        return sps.norm.cdf(mu / np.sqrt(1.0 + var))
