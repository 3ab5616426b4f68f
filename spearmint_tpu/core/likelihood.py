"""GP log-marginal likelihood (the slice-sampling hot path).

Parity: the ``logprob`` closures inside the reference choosers
(``GPEIOptChooser._sample_ls`` / ``_sample_noisy`` ≈L200-260, per
SURVEY.md §3.2).  The reference formula — note it deliberately omits the
constant −(n/2)·log 2π, which slice sampling never needs:

    K    = amp2 · (kernel(ls, X) + 1e-6·I) + noise·I
    L    = chol(K)
    lp   = −Σ log diag(L) − ½ (y − mean)ᵀ K⁻¹ (y − mean)

Everything here is pure/jittable and masked for static shapes; vmap over a
leading hyperparameter axis gives batched chain evaluation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from spearmint_tpu.core import linalg
from spearmint_tpu.core.kernels import matern52

JITTER = 1e-6


class GPHypers(NamedTuple):
    """One GP hyperparameter state (one slice-sampling chain's position)."""

    mean: jnp.ndarray   # scalar
    amp2: jnp.ndarray   # scalar, signal variance
    noise: jnp.ndarray  # scalar, observation noise variance
    ls: jnp.ndarray     # (D,) ARD length scales


def _effective_jitter(n: int) -> float:
    """Reference jitter (1e-6) plus an f32-conditioning term at large n.

    f32 Cholesky roundoff grows ~n·eps·λmax with λmax ~ n·amp2; beyond a
    few thousand observations the reference's fixed 1e-6 leaves
    cond(K) ≈ n/noise at the f32 failure edge (observed: NaN chol at
    n=12288, noise=1e-3).  The extra term is 0 below n=2048, so small-n
    numerics — and golden-parity tests — are bit-identical.
    """
    return JITTER + 2e-7 * max(0, n - 2048)


def cov_matrix(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    amp2: jnp.ndarray,
    noise: jnp.ndarray,
    ls: jnp.ndarray,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """amp2·(k(X,X) + jitter·I) + noise·I with padded rows/cols → identity."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    k = amp2 * (kernel(x, x, ls) + _effective_jitter(n) * eye) + noise * eye
    return linalg.mask_psd_matrix(k, mask)


def unit_cov_matrix(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    ls: jnp.ndarray,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """M = k(X,X) + jitter·I with padded rows/cols zeroed.

    The amp2/noise-independent part of ``cov_matrix``:
    K = amp2·M + diag(where(mask, noise, 1)).  Every marginal
    evaluation (``log_marginal`` → ``linalg.fma_logdet_q``) and every
    posterior-cache factorization (``linalg.cache_factor`` /
    ``factor_solve``) assembles through this M-form, so on TPU they all
    share one numerical path — the shifted fused kernel."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    both = mask[:, None] & mask[None, :]
    return jnp.where(both, kernel(x, x, ls) + _effective_jitter(n) * eye,
                     0.0)


def cross_cov(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    amp2: jnp.ndarray,
    ls: jnp.ndarray,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """amp2·k(X1, X2) (reference ``self.cov(comp, cand)`` — no jitter)."""
    return amp2 * kernel(x1, x2, ls)


def log_marginal(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    hypers: GPHypers,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """Reference GP log-marginal (sans 2π constant), masked/jittable."""
    m0 = unit_cov_matrix(x, mask, hypers.ls, kernel)
    dadd = jnp.where(mask, hypers.noise, jnp.asarray(1.0, x.dtype))
    resid = jnp.where(mask, y - hypers.mean, 0.0)
    # One fused call: rᵀK⁻¹r = ‖L⁻¹r‖² via the in-factorization solve
    # (no standalone latency-bound trisolve), Σ log diag(L) from the
    # same factorization.  On TPU this is a single Pallas kernel
    # (ops/pallas_gp) evaluated through the SAME shifted form the
    # joint-move cache uses (K = amp2·M + diag), so the log-marginal
    # carried across slice moves and re-evaluated inside them is
    # internally consistent; off-TPU it is the assemble→chol→
    # blocked-trisolve XLA sequence (linalg.fma_logdet_q fallback),
    # bit-identical to the reference formula.
    ld, q = linalg.fma_logdet_q(m0, jnp.asarray(hypers.amp2, x.dtype),
                                dadd, resid)
    lp = -ld - 0.5 * q
    # A failed (non-PD) factorization yields NaN; slice sampling treats it
    # as −inf, mirroring the reference's hard failure but recoverably.
    return jnp.where(jnp.isnan(lp), -jnp.inf, lp)
