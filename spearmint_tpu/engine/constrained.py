"""Constrained EI: probit latent-GP constraint classifier weighting EI.

Parity: reference ``chooser/GPConstrainedEIChooser.py`` (≈500 LoC,
SURVEY.md §2 #17; weighting mechanism marked [verify] there — this is
the standard construction): evaluations that *violate* a constraint
(signalled by a NaN objective value) carry a binary label; a latent GP
``f`` with a probit likelihood P(valid|f)=Φ(f) classifies the space, and
the acquisition becomes

    EI_valid(x) · Φ( μ_f(x) / sqrt(1 + σ²_f(x)) )

where EI_valid is ordinary EI on the *valid* observations only and the
second factor is the probit predictive probability of feasibility.

Sampling: latent values by elliptical slice sampling (mcmc/ess.py) under
the probit likelihood; constraint-GP length scales by the same scalar
slice sampler used everywhere, against the latent vector's GP prior
density.  All of it vmapped over chains in one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from spearmint_tpu.acquire import ei as ei_mod
from spearmint_tpu.acquire.optimize import minimize_lbfgs_b
from spearmint_tpu.core import linalg, priors
from spearmint_tpu.core.likelihood import GPHypers
from spearmint_tpu.engine.suggest import (
    SuggestConfig, _chunked_vmap, _flatten_samples, nan_robust_mean,
)
from spearmint_tpu.mcmc.chains import marginal_at, sample_hypers_lp
from spearmint_tpu.mcmc.ess import elliptical_slice
from spearmint_tpu.mcmc.slice import slice_sample


class ConstraintState(NamedTuple):
    """Per-chain constraint model state."""

    ls: jnp.ndarray     # (D,) constraint-GP length scales
    amp2: jnp.ndarray   # scalar amplitude
    ff: jnp.ndarray     # (N,) latent values at observed points


class ConstrainedResult(NamedTuple):
    hypers: GPHypers
    constraint: ConstraintState
    acq: jnp.ndarray           # [C] weighted acquisition on candidates
    p_valid: jnp.ndarray       # [C] mean feasibility probability
    best_cand: jnp.ndarray
    best_cand_acq: jnp.ndarray
    x_opt: jnp.ndarray
    acq_opt: jnp.ndarray
    n_ok: jnp.ndarray = None  # samples with finite caches (see
                              # engine.suggest.SuggestResult.n_ok)


def _constraint_cov(x, mask, ls, amp2, kernel):
    from spearmint_tpu.core.likelihood import _effective_jitter

    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    # _effective_jitter, not the bare 1e-6: the constraint GP has no
    # noise term (exact latent values), so at large n its covariance
    # sits right at the f32 factorization edge without the
    # conditioning floor the value GP gets (identical below n=2048).
    k = amp2 * (kernel(x, x, ls) + _effective_jitter(n) * eye)
    return linalg.mask_psd_matrix(k, mask)


def _probit_loglik(ff, z, mask):
    """Σ log Φ(z·f) over observed points (z=+1 valid, −1 invalid)."""
    lp = jax.scipy.stats.norm.logcdf(z * ff)
    return jnp.sum(jnp.where(mask, lp, 0.0))


def _sample_constraint(key, state: ConstraintState, x, z, mask, kernel,
                       max_ls, ess_sweeps=4):
    """One constraint-model sweep: latent ESS moves, ls slice move, then
    an amp2 slice move under the reference's lognormal amplitude prior
    (GPConstrainedEIChooser samples the constraint GP's amp2 with the
    same machinery as the value GP's, ≈L500)."""
    k_ess, k_ls, k_amp = jax.random.split(key, 3)

    cov = _constraint_cov(x, mask, state.ls, state.amp2, kernel)
    chol = linalg.cholesky(cov)

    def ess_body(ff, kk):
        ff2 = elliptical_slice(kk, ff, chol,
                               lambda f: _probit_loglik(f, z, mask))
        return ff2, None

    ff, _ = lax.scan(ess_body, state.ff, jax.random.split(k_ess, ess_sweeps))
    ff = jnp.where(mask, ff, 0.0)

    def ls_logprob(ls):
        valid = priors.ls_in_bounds(ls, max_ls)
        ls_s = jnp.clip(ls, 1e-6, max_ls)
        k = _constraint_cov(x, mask, ls_s, state.amp2, kernel)
        # fused factor+logdet+solve (see core.likelihood.log_marginal)
        ld, q = linalg.chol_logdet_q(k, ff)
        lp = -ld - 0.5 * q
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        return jnp.where(valid, lp, -jnp.inf)

    ls = slice_sample(k_ls, state.ls, ls_logprob, compwise=True)

    # amp2 move: K = amp2·M with M fixed by the new ls, so every slice
    # eval is closed-form off ONE cached factorization of the unit
    # matrix M — ½logdet(amp2·M) = (n/2)·log amp2 + ½logdet M over real
    # rows (padded diag of M is 1 → contributes 0), and the quadratic
    # form scales as 1/amp2 (padded ff entries are exact 0).
    ls_s = jnp.clip(ls, 1e-6, max_ls)
    unit = _constraint_cov(x, mask, ls_s, jnp.asarray(1.0, x.dtype), kernel)
    chu = linalg.cholesky(unit)
    wu = linalg.tri_solve(chu, ff)
    quad = jnp.dot(wu, wu)
    half_logdet_unit = linalg.logdet_from_chol(chu)
    n_eff = jnp.sum(mask.astype(x.dtype))

    def amp2_logprob(a_vec):
        a = a_vec[0]
        valid = a > 0.0
        a_s = jnp.where(valid, a, 1.0)
        lp = (-0.5 * n_eff * jnp.log(a_s) - half_logdet_unit
              - 0.5 * quad / a_s + priors.lognormal_amp2_term(a_s))
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        return jnp.where(valid, lp, -jnp.inf)

    amp2 = slice_sample(k_amp, state.amp2[None], amp2_logprob,
                        compwise=True)[0]
    return ConstraintState(ls=ls, amp2=amp2, ff=ff)


@partial(jax.jit, static_argnames=("kernel", "max_ls", "steps"))
def burnin_constraint_states(
    key: jax.Array,
    constraint: ConstraintState,   # [chains, ...]
    x: jnp.ndarray,
    z: jnp.ndarray,
    mask: jnp.ndarray,
    steps: int,
    kernel=None,
    max_ls: float = priors.MAX_LS,
) -> ConstraintState:
    """Burn in the latent constraint chains (mirrors mcmc.chains.burnin
    for the value GP; the reference burns in ALL chooser state in
    _real_init ≈L90)."""
    from spearmint_tpu.core.kernels import matern52

    kern = kernel or matern52
    chains = constraint.amp2.shape[0]

    def burn(k, c0):
        def body(c, kk):
            return _sample_constraint(kk, c, x, z, mask, kern, max_ls), None

        out, _ = lax.scan(body, c0, jax.random.split(k, steps))
        return out

    return jax.vmap(burn)(jax.random.split(key, chains), constraint)


class ConstraintCache(NamedTuple):
    """Per-sample constraint-GP factorization reused across acquisition
    evaluations (the constraint-side analogue of ei.PosteriorCache —
    before r4 every acquisition point evaluation refactored the n×n
    constraint covariance, which dominated the constrained suggestion:
    each of the L-BFGS refinement's point evaluations paid a fresh
    batched Cholesky)."""

    state: ConstraintState
    linv: jnp.ndarray   # (N, N) explicit L⁻¹ of the constraint cov
    alpha: jnp.ndarray  # (N,) K⁻¹ ff


def _make_constraint_cache(state: ConstraintState, x, mask, kernel):
    m0 = _constraint_unit_cov(x, mask, state.ls, kernel)
    # K = amp2·M exactly (no noise term; padded diag = 1): dadd = 1 on
    # padded rows only, matching _constraint_cov's masked identity.
    dadd = jnp.where(mask, 0.0, 1.0).astype(x.dtype)
    _, linv, alpha = linalg.cache_factor(
        m0, jnp.asarray(state.amp2, x.dtype), dadd, state.ff)
    return ConstraintCache(state=state, linv=linv, alpha=alpha)


def _constraint_unit_cov(x, mask, ls, kernel):
    from spearmint_tpu.core.likelihood import _effective_jitter

    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    k = kernel(x, x, ls) + _effective_jitter(n) * eye
    both = mask[:, None] & mask[None, :]
    return jnp.where(both, k, 0.0)


def _p_valid_from_cache(cache: ConstraintCache, x, mask, cand, kernel):
    """Probit predictive feasibility probability at candidate points."""
    from spearmint_tpu.core.likelihood import _effective_jitter

    state = cache.state
    kx = state.amp2 * kernel(x, cand, state.ls) * mask[:, None]
    mu = jnp.matmul(kx.T, cache.alpha,
                    precision=jax.lax.Precision.HIGHEST)
    # bf16_3x is sufficient HERE (unlike EI's variance): the probit
    # variance only enters as 1+σ² ≥ 1, so a ~1e-4 absolute β² error
    # cannot blow up the feasibility probability.
    beta = jnp.matmul(cache.linv, kx, precision=jax.lax.Precision.HIGH)
    # _effective_jitter (not the bare 1e-6) to match the assembled
    # covariance diagonal (_constraint_cov): at large n the prior
    # variance otherwise underestimates amp2·(1+ε_n) and a candidate
    # sitting on an observation clamps to the 1e-10 floor.
    var = (state.amp2 * (1.0 + _effective_jitter(x.shape[0]))
           - jnp.sum(beta * beta, axis=0))
    var = jnp.maximum(var, 1e-10)
    return jax.scipy.stats.norm.cdf(mu / jnp.sqrt(1.0 + var))


def _p_valid_at(state: ConstraintState, x, mask, cand, kernel):
    """One-shot probit feasibility (tests / small paths): build the
    cache and evaluate."""
    return _p_valid_from_cache(
        _make_constraint_cache(state, x, mask, kernel), x, mask, cand,
        kernel)


@partial(jax.jit, static_argnames=("config",))
def suggest_step_constrained(
    key: jax.Array,
    hypers: GPHypers,            # [chains, ...] value-GP states
    constraint: ConstraintState,  # [chains, ...] constraint states
    x: jnp.ndarray,              # [N, D] ALL observed points (padded)
    y: jnp.ndarray,              # [N] values (0 where invalid/padded)
    valid_mask: jnp.ndarray,     # [N] finite-objective observations
    obs_mask: jnp.ndarray,       # [N] any completed observation
    cand: jnp.ndarray,
    cand_mask: jnp.ndarray,
    config: SuggestConfig = SuggestConfig(),
) -> ConstrainedResult:
    chains = hypers.mean.shape[0]
    iters = config.mcmc_iters
    s = chains * iters
    kernel = config.kernel
    k_val, k_con = jax.random.split(key)

    # probit labels over completed points
    z = jnp.where(valid_mask, 1.0, -1.0).astype(x.dtype)

    # --- value GP over valid observations -------------------------------
    def chain_fn(k, h0):
        ks = jax.random.split(k, iters)
        lp0 = marginal_at(x, y, valid_mask, h0, config.mcmc)

        def body(carry, kk):
            h, lp = carry
            h2, lp2 = sample_hypers_lp(kk, h, lp, x, y, valid_mask,
                                       config.mcmc)
            return (h2, lp2), h2

        (h_out, _), samples = lax.scan(body, (h0, lp0), ks)
        return h_out, samples

    # chain_chunk / explicit_inverse: the flagship's memory policy,
    # threaded through so large-pad constrained suggestions stay under
    # the HBM cliff too (VERDICT r2 weak #4).
    h_last, samples = _chunked_vmap(chain_fn, config.chain_chunk)(
        jax.random.split(k_val, chains), hypers)
    flat = _flatten_samples(samples, s)
    caches = _chunked_vmap(
        lambda h: ei_mod.make_cache(
            x, y, valid_mask, h, kernel,
            with_inverse=config.explicit_inverse),
        config.chain_chunk,
    )(flat)

    # --- constraint model over all observations -------------------------
    def con_chain(k, c0):
        ks = jax.random.split(k, iters)

        def body(c, kk):
            c2 = _sample_constraint(kk, c, x, z, obs_mask, kernel,
                                    config.max_ls)
            return c2, c2

        return lax.scan(body, c0, ks)

    c_last, c_samples = _chunked_vmap(con_chain, config.chain_chunk)(
        jax.random.split(k_con, chains), constraint)
    c_flat = _flatten_samples(c_samples, s)
    # one constraint-GP factorization per sample, reused by every
    # acquisition evaluation (grid sweep AND each L-BFGS point eval —
    # without this the refinement loop refactored the n×n constraint
    # covariance per step, dominating the constrained suggestion)
    c_caches = _chunked_vmap(
        lambda c: _make_constraint_cache(c, x, obs_mask, kernel),
        config.chain_chunk,
    )(c_flat)

    def acq_at(pts):
        eis = _chunked_vmap(
            lambda c: ei_mod.ei_from_cache(c, x, valid_mask, pts, kernel),
            config.chain_chunk,
        )(caches)                                        # [S, C']
        pv = _chunked_vmap(
            lambda c: _p_valid_from_cache(c, x, obs_mask, pts, kernel),
            config.chain_chunk,
        )(c_caches)                                      # [S, C']
        return eis * pv, pv

    # NaN-robust sample average (see engine/suggest.py): exclude samples
    # whose cache factorization failed at the f32 conditioning edge.
    ok = (jnp.all(jnp.isfinite(caches.alpha.reshape(s, -1)), axis=1)
          & jnp.all(jnp.isfinite(c_caches.alpha.reshape(s, -1)), axis=1))

    acq_samples, pv_samples = acq_at(cand)
    acq_mean, n_ok_true = nan_robust_mean(acq_samples, ok)
    pv_mean, _ = nan_robust_mean(pv_samples, ok)
    n_ok = jnp.maximum(n_ok_true.astype(x.dtype), 1.0)
    acq_masked = jnp.where(cand_mask, acq_mean, -jnp.inf)
    best_cand = jnp.argmax(acq_masked)
    best_cand_acq = acq_masked[best_cand]

    if config.optimize:
        ksub = min(config.grid_subset, cand.shape[0])
        _, top_idx = lax.top_k(acq_masked, ksub)
        starts = cand[top_idx]

        def neg_acq(pt):
            a, _ = acq_at(pt[None])
            a = jnp.where(ok & jnp.isfinite(a[:, 0]), a[:, 0], 0.0)
            return -jnp.sum(a) / n_ok

        dim = cand.shape[1]
        res = minimize_lbfgs_b(
            neg_acq, starts, jnp.zeros(dim, cand.dtype),
            jnp.ones(dim, cand.dtype), iters=config.lbfgs_iters)
        lane = jnp.argmin(res.fun)
        x_opt, acq_opt = res.x[lane], -res.fun[lane]
    else:
        x_opt, acq_opt = cand[best_cand], best_cand_acq

    return ConstrainedResult(
        hypers=h_last, constraint=c_last, acq=acq_mean, p_valid=pv_mean,
        best_cand=best_cand, best_cand_acq=best_cand_acq,
        x_opt=x_opt, acq_opt=acq_opt, n_ok=n_ok_true,
    )


def init_constraint_states(ndim: int, n_pad: int, chains: int,
                           dtype=jnp.float32) -> ConstraintState:
    one = ConstraintState(
        ls=jnp.ones((ndim,), dtype),
        amp2=jnp.asarray(1.0, dtype),
        ff=jnp.zeros((n_pad,), dtype),
    )
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (chains,) + a.shape), one)
