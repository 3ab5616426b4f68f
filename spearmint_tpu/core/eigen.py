"""Eigendecomposition-cached GP log-marginal for the joint slice move.

During the reference's joint (mean, amp2, noise) slice move
(``GPEIOptChooser._sample_noisy``, SURVEY.md §3.2) the ARD length scales
are FIXED, so every log-marginal evaluated inside the move shares one
kernel matrix:

    K(mean, amp2, noise) = amp2·M + noise·I,   M = k(X,X) + jitter·I.

The chol-based path pays an O(n³) factorization per slice evaluation
(5–30 per move).  With one eigendecomposition M = Q Λ Qᵀ per move:

    log det K = Σᵢ log(amp2·λᵢ + noise)
    (y−mean)ᵀ K⁻¹ (y−mean) = Σᵢ wᵢ² / (amp2·λᵢ + noise),
        w = Qᵀy − mean·Qᵀ𝟙     (both projections precomputed)

every evaluation is O(n).  The move's cost collapses to one eigh plus
noise — worth it whenever eigh < (evals−1)·cholesky, measured on the
target hardware (see docs/PROFILE_r2.md).

Padding: M is exactly block-diagonal between real and padded
observations.  Padded diagonal entries are set to −1, so padded
eigenvalues land at −1 while real ones are ≥ jitter > 0 in exact
arithmetic — `lam > −0.5` separates the blocks robustly even under f32
eigh error.  Padded eigenpairs are masked out of both sums, and real
eigenvalues are clamped at jitter (their true lower bound, since
M = PSD + jitter·I) to absorb f32 eigh roundoff.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from spearmint_tpu.core import linalg
from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import _effective_jitter


class JointEigCache(NamedTuple):
    """Per-(X, ls) spectral cache for O(n) joint-move evaluations."""

    lam: jnp.ndarray    # (N,) eigenvalues of M (padded block ≈ −1)
    real: jnp.ndarray   # (N,) bool: eigenpair belongs to the real block
    qy: jnp.ndarray     # (N,) Qᵀ(y·mask)
    qm: jnp.ndarray     # (N,) Qᵀmask  (for the −mean·𝟙 shift)
    y_min: jnp.ndarray  # scalars, for the mean-in-bounds prior check
    y_max: jnp.ndarray


def joint_eig_cache(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    ls: jnp.ndarray,
    kernel: Callable = matern52,
) -> JointEigCache:
    """One batched eigh per joint move, shared by all its evaluations."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    both = mask[:, None] & mask[None, :]
    m = jnp.where(both, kernel(x, x, ls) + _effective_jitter(n) * eye, 0.0)
    m = m - jnp.where(mask, 0.0, 1.0) * eye  # padded diagonal → −1
    lam, q = jnp.linalg.eigh(m)
    real = lam > -0.5
    jitter = jnp.asarray(_effective_jitter(n), x.dtype)
    lam = jnp.where(real, jnp.maximum(lam, jitter), lam)
    mvec = mask.astype(x.dtype)
    qy = q.T @ jnp.where(mask, y, 0.0)
    qm = q.T @ mvec
    return JointEigCache(
        lam=lam, real=real, qy=qy, qm=qm,
        y_min=linalg.masked_min(y, mask), y_max=linalg.masked_max(y, mask),
    )


def log_marginal_eig(
    cache: JointEigCache,
    mean: jnp.ndarray,
    amp2: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Reference log-marginal (sans 2π constant) from the spectral cache.

    Identical quantity to ``core.likelihood.log_marginal`` at the same
    (mean, amp2, noise, ls) up to f32 roundoff:
        −Σ log diag(L) − ½ rᵀK⁻¹r = −½ Σ log sᵢ − ½ Σ wᵢ²/sᵢ .
    """
    s = amp2 * cache.lam + noise
    s = jnp.where(cache.real, s, 1.0)
    w = jnp.where(cache.real, cache.qy - mean * cache.qm, 0.0)
    lp = -0.5 * jnp.sum(jnp.where(cache.real, jnp.log(s), 0.0))
    lp = lp - 0.5 * jnp.sum(w * w / s)
    return jnp.where(jnp.isnan(lp), -jnp.inf, lp)
