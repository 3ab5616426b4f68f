"""Expected Improvement and GP posterior, masked/jittable.

Parity: ``GPEIOptChooser.compute_ei`` ≈L300 (SURVEY.md §3.2):

    K     = amp2·(k(X,X) + 1e-6 I) + noise·I
    L     = chol(K);  α = K⁻¹ (y − mean);  B = L⁻¹ k(X, C)·amp2
    m(C)  = mean + k(X,C)ᵀ α
    v(C)  = amp2·(1 + 1e-6) − Σ B²         (per-candidate)
    u     = (best − m)/√v
    EI    = √v · (u·Φ(u) + φ(u))

``best`` is min over the *supplied* values — with fantasized pending
outcomes included when present, exactly as the reference's augmented-data
call.  EI under multiple hyperparameter samples is averaged by the caller
(vmap over a leading hypers axis).

On TPU the caches come from the fused Pallas factorization pair
(linalg.cache_factor / factor_solve → ops/pallas_gp) and every EI
evaluation is then a batched GEMM against the materialized L⁻¹.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from spearmint_tpu.core import linalg
from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import (
    GPHypers,
    _effective_jitter,
    cross_cov,
    unit_cov_matrix,
)


class PosteriorCache(NamedTuple):
    """Per-hyperparameter-sample factorization reused across EI evals.

    ``alpha``/``best`` may carry a leading fantasy axis F (the
    factorization is fantasy-independent — only residuals differ), in
    which case EI evaluations return [F, C].

    ``linv`` (optional, ``with_inverse=True``) is the explicit L⁻¹: a
    triangular solve against a [N, 1] right-hand side is latency-bound
    on TPU (sequential over diagonal blocks), so the few-point EI
    evaluations inside the L-BFGS refinement loop pay ~N block-steps
    per eval; with L⁻¹ materialized once (one O(n³/6) triangular
    inversion per sample, amortized over every refinement step) each
    eval is a dense GEMM that vmap batches onto the MXU.
    """

    chol: jnp.ndarray   # (N, N) lower Cholesky of the observation cov
    alpha: jnp.ndarray  # (N,) or (F, N): K⁻¹(y − mean)
    best: jnp.ndarray   # scalar or (F,): incumbent (min of values)
    hypers: GPHypers
    linv: jnp.ndarray | None = None  # (N, N) explicit L⁻¹, optional


def make_cache(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    hypers: GPHypers,
    kernel: Callable = matern52,
    with_inverse: bool = False,
) -> PosteriorCache:
    resid = jnp.where(mask, y - hypers.mean, 0.0)
    # Both cache forms factor through the SAME shifted assembly the
    # sampler evaluated these hypers with (linalg.cache_factor /
    # factor_solve): on TPU the factorization is produced by the fused
    # Pallas kernel (plus the blocked-inversion kernel for L⁻¹), not
    # redone by XLA; off-TPU both are bit-identical to the r3
    # assemble → cholesky → cho_solve [→ tri_inverse] sequence.
    m0 = unit_cov_matrix(x, mask, hypers.ls, kernel)
    dadd = jnp.where(mask, hypers.noise, jnp.asarray(1.0, x.dtype))
    amp2 = jnp.asarray(hypers.amp2, x.dtype)
    if with_inverse:
        chol, linv, alpha = linalg.cache_factor(m0, amp2, dadd, resid)
    else:
        chol, alpha = linalg.factor_solve(m0, amp2, dadd, resid)
        linv = None
    best = linalg.masked_min(y, mask)
    return PosteriorCache(chol=chol, alpha=alpha, best=best, hypers=hypers,
                          linv=linv)


def make_cache_aug(
    x_aug: jnp.ndarray,
    mask_aug: jnp.ndarray,
    y_augs: jnp.ndarray,
    hypers: GPHypers,
    kernel: Callable = matern52,
    with_inverse: bool = True,
) -> PosteriorCache:
    """PosteriorCache over AUGMENTED (obs ∪ pend) data with a leading
    fantasy axis: y_augs is [F, N+P] (observed values broadcast, one
    fantasy draw per row).

    The factorization depends only on locations, so F fantasy draws
    share ONE factorization — routed through the fused shifted kernel
    (linalg.cache_factor / factor_solve), the same assembly/rounding
    the sampler evaluated these hypers with; the augmented pad lands on
    a supported bucket because callers pad pending via
    ``linalg.pend_pad``.  Per-fantasy α = K⁻¹r_f is two GEMMs against
    the explicit L⁻¹, or two lower-triangular solves in the no-inverse
    memory mode (both read only the lower triangle — the fused
    factor's strictly-upper tiles contain garbage).  Shared by
    engine/suggest.py and engine/per_sec.py so the pending path's
    numerics live in exactly one place.
    """
    m0_aug = unit_cov_matrix(x_aug, mask_aug, hypers.ls, kernel)
    dadd = jnp.where(mask_aug, hypers.noise,
                     jnp.asarray(1.0, x_aug.dtype))
    amp2 = jnp.asarray(hypers.amp2, x_aug.dtype)
    resid = jnp.where(mask_aug[None, :], y_augs - hypers.mean, 0.0)
    hp = jax.lax.Precision.HIGHEST
    if with_inverse:
        chol, linv, _ = linalg.cache_factor(m0_aug, amp2, dadd, resid[0])
        w = jnp.matmul(linv, resid.T, precision=hp)
        alpha = jnp.matmul(linv.T, w, precision=hp).T         # [F, N+P]
    else:
        chol, _ = linalg.factor_solve(m0_aug, amp2, dadd, resid[0])
        linv = None
        w = jax.lax.linalg.triangular_solve(
            chol, resid.T, left_side=True, lower=True)
        alpha = jax.lax.linalg.triangular_solve(
            chol, w, left_side=True, lower=True,
            transpose_a=True).T                               # [F, N+P]
    best = jnp.min(jnp.where(mask_aug[None, :], y_augs, jnp.inf),
                   axis=1)                                    # [F]
    return PosteriorCache(chol=chol, alpha=alpha, best=best,
                          hypers=hypers, linv=linv)


def posterior_from_cache(
    cache: PosteriorCache,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cand: jnp.ndarray,
    kernel: Callable = matern52,
):
    """Posterior mean/variance at candidate points given a cache."""
    h = cache.hypers
    kx = cross_cov(x, cand, h.amp2, h.ls, kernel)
    kx = kx * mask[:, None]  # padded observations contribute nothing
    # Precision.HIGHEST on both projections: var is the near-cancelling
    # difference amp2·(1+ε) − Σβ² (var/amp2 reaches 1e-4 at realistic
    # hypers), and u = (best−mu)/σ divides by its square root.  Raw
    # bf16 β made variances NEGATIVE on TPU, and bf16_3x ("high") was
    # measured at 1.5e-4 absolute on Σβ² — up to 36% relative on the
    # smallest meaningful variances (tests/test_tpu_smoke.py vs float64
    # golden math, r4).  HIGHEST costs only ~0.04 s of flagship latency
    # over bf16_3x in like-for-like bench runs — calibrated posterior
    # uncertainty is the whole point of fully-Bayesian BO, so f32 wins.
    # tensordot handles both (N,) → (C,) and (F, N) → (F, C) alphas
    mu = h.mean + jnp.tensordot(cache.alpha, kx, axes=((-1,), (0,)),
                                precision=jax.lax.Precision.HIGHEST)
    if cache.linv is not None:
        beta = jnp.matmul(cache.linv, kx,
                          precision=jax.lax.Precision.HIGHEST)
    else:
        beta = linalg.tri_solve(cache.chol, kx)
    # Prior-variance term uses the SAME jitter the covariance was
    # assembled with (_effective_jitter, not the bare 1e-6): above
    # n=2048 the two differ by up to ~1e-3·amp2 and the mismatch
    # understates the smallest posterior variances near observations
    # (the r4 ADVICE fix applied this to the constrained path; r5's
    # review found the value-GP paths shared the bug).  Identical
    # below n=2048, so small-n golden parity is untouched.
    var = (h.amp2 * (1.0 + _effective_jitter(x.shape[0]))
           - jnp.sum(beta * beta, axis=0))
    return mu, var


def _ei_from_moments(mu, var, best):
    sigma = jnp.sqrt(jnp.maximum(var, 1e-14))
    best = jnp.asarray(best)
    if best.ndim > 0:  # fantasy axis: (F,) against mu (F, C)
        best = best[..., None]
    u = (best - mu) / sigma
    ncdf = jax.scipy.stats.norm.cdf(u)
    npdf = jax.scipy.stats.norm.pdf(u)
    return sigma * (u * ncdf + npdf)


def compute_ei(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    hypers: GPHypers,
    cand: jnp.ndarray,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """EI at each candidate under one hyperparameter sample."""
    cache = make_cache(x, y, mask, hypers, kernel)
    mu, var = posterior_from_cache(cache, x, mask, cand, kernel)
    return _ei_from_moments(mu, var, cache.best)


def ei_from_cache(
    cache: PosteriorCache,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cand: jnp.ndarray,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """EI reusing a precomputed factorization (EI-optimization inner loop)."""
    mu, var = posterior_from_cache(cache, x, mask, cand, kernel)
    return _ei_from_moments(mu, var, cache.best)


def ei_from_cache_chunked(
    cache: PosteriorCache,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cand: jnp.ndarray,
    kernel: Callable = matern52,
    chunk: int = 512,
) -> jnp.ndarray:
    """EI over a large candidate set, chunked to bound HBM temps.

    The n×C triangular solve allocates O(S·n·C) of blocked-solve
    temporaries; at n=8k, C=2k, S=10 samples that overflows a 16 GB HBM.
    ``lax.map`` over candidate chunks caps the live temp at O(S·n·chunk)
    while keeping each chunk MXU-sized.  Exact same values as the
    unchunked path.
    """
    c = cand.shape[0]
    if c <= chunk:
        return ei_from_cache(cache, x, mask, cand, kernel)
    n_chunks = -(-c // chunk)
    padded = n_chunks * chunk
    if padded != c:  # pad with the first candidate; extra rows discarded
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(cand[:1], (padded - c, cand.shape[1]))],
            axis=0,
        )
    chunks = cand.reshape(n_chunks, chunk, cand.shape[1])
    out = jax.lax.map(
        lambda cc: ei_from_cache(cache, x, mask, cc, kernel), chunks
    )
    if out.ndim == 3:  # fantasy axis: [chunks, F, chunk] → [F, C]
        out = jnp.moveaxis(out, 0, 1).reshape(out.shape[1], padded)
        return out[:, :c]
    return out.reshape(padded)[:c]
