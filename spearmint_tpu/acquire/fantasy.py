"""Pending-job fantasization (asynchronous parallel BO).

Parity: the pending branch of ``GPEIOptChooser.next`` ≈L200
(SURVEY.md §3.2): for each hyperparameter sample, draw the pending jobs'
outcomes from the GP posterior (noise-free function draw), append them to
the observed data, and compute EI against the augmented set.  In the
rebuild this is a pure function of (key, data, pending, hypers) → it
vmaps over a (chain × fantasy) axis, turning the reference's sequential
per-chain resampling into one batched draw (SURVEY.md §2b row 1).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from spearmint_tpu.core import linalg
from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import (
    GPHypers,
    JITTER,
    cross_cov,
    unit_cov_matrix,
)


def fantasize(
    key: jax.Array,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    pend: jnp.ndarray,
    pend_mask: jnp.ndarray,
    hypers: GPHypers,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """Sample fantasy outcomes at pending points from the GP posterior.

    Returns fantasy values of shape (P,), meaningful where pend_mask.
    """
    n_pend = pend.shape[0]
    # fused-path factorization — see fantasize_batch
    m0 = unit_cov_matrix(x, mask, hypers.ls, kernel)
    dadd = jnp.where(mask, hypers.noise, jnp.asarray(1.0, x.dtype))
    resid = jnp.where(mask, y - hypers.mean, 0.0)
    obs_chol, alpha = linalg.factor_solve(
        m0, jnp.asarray(hypers.amp2, x.dtype), dadd, resid)

    kx = cross_cov(x, pend, hypers.amp2, hypers.ls, kernel)
    kx = kx * mask[:, None]
    # Reference kappa = self.cov(pend) = amp2·(k + 1e-6 I): noise-free draw.
    eye_p = jnp.eye(n_pend, dtype=x.dtype)
    kappa = hypers.amp2 * (kernel(pend, pend, hypers.ls) + JITTER * eye_p)

    # HIGHEST on the projection GEMMs: pend_k is the near-cancelling
    # posterior covariance kappa − βᵀβ (same failure mode as EI's var —
    # see acquire/ei.posterior_from_cache).
    hp = jax.lax.Precision.HIGHEST
    pend_m = hypers.mean + jnp.matmul(kx.T, alpha, precision=hp)
    beta = linalg.tri_solve(obs_chol, kx)
    pend_k = kappa - jnp.matmul(beta.T, beta, precision=hp)
    pend_k = linalg.mask_psd_matrix(pend_k + JITTER * eye_p, pend_mask)
    pend_chol = linalg.cholesky(pend_k)

    draw = jax.random.normal(key, (n_pend,), dtype=x.dtype)
    fant = pend_m + pend_chol @ draw
    return jnp.where(pend_mask, fant, 0.0)


def fantasize_batch(
    key: jax.Array,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    pend: jnp.ndarray,
    pend_mask: jnp.ndarray,
    hypers: GPHypers,
    n_fantasies: int,
    kernel: Callable = matern52,
) -> jnp.ndarray:
    """(F, P) independent fantasy draws from one posterior.

    Reference parity: ``GPEIOptChooser`` draws ``pending_samples``
    (default 100) fantasy columns per hyperparameter sample and averages
    EI over them (≈L200); the posterior factorization is shared across
    draws, so this is one Cholesky + F matvecs.
    """
    n_pend = pend.shape[0]
    # Observation-cov factorization through the SAME shifted fused path
    # the sampler evaluated these hypers with (linalg.factor_solve →
    # ops/pallas_gp on TPU; bit-identical XLA sequence elsewhere) — the
    # r4 smoke proved separately-assembled refactorizations NaN at the
    # f32 conditioning edge where the sampler's own form is finite.
    m0 = unit_cov_matrix(x, mask, hypers.ls, kernel)
    dadd = jnp.where(mask, hypers.noise, jnp.asarray(1.0, x.dtype))
    resid = jnp.where(mask, y - hypers.mean, 0.0)
    obs_chol, alpha = linalg.factor_solve(
        m0, jnp.asarray(hypers.amp2, x.dtype), dadd, resid)

    kx = cross_cov(x, pend, hypers.amp2, hypers.ls, kernel)
    kx = kx * mask[:, None]
    eye_p = jnp.eye(n_pend, dtype=x.dtype)
    kappa = hypers.amp2 * (kernel(pend, pend, hypers.ls) + JITTER * eye_p)

    # HIGHEST on the projection GEMMs: pend_k is the near-cancelling
    # posterior covariance kappa − βᵀβ (same failure mode as EI's var —
    # see acquire/ei.posterior_from_cache).  tri_solve reads the lower
    # triangle only (the fused factor's upper tiles contain garbage).
    hp = jax.lax.Precision.HIGHEST
    pend_m = hypers.mean + jnp.matmul(kx.T, alpha, precision=hp)
    beta = linalg.tri_solve(obs_chol, kx)
    pend_k = kappa - jnp.matmul(beta.T, beta, precision=hp)
    pend_k = linalg.mask_psd_matrix(pend_k + JITTER * eye_p, pend_mask)
    # The P×P pending-pending factorization stays on XLA cholesky by
    # design: P pads to ≤ a few hundred (sub-512, below the fused
    # kernel's floor) and costs O(P³) ≈ microseconds — the n×n obs and
    # (n+P)² augmented factorizations are the ones routed through the
    # fused kernel.
    pend_chol = linalg.cholesky(pend_k)

    draws = jax.random.normal(key, (n_fantasies, n_pend), dtype=x.dtype)
    fant = pend_m[None, :] + draws @ pend_chol.T
    return jnp.where(pend_mask[None, :], fant, 0.0)


def augment(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    pend: jnp.ndarray,
    pend_mask: jnp.ndarray,
    fant: jnp.ndarray,
):
    """Concatenate fantasized pending outcomes onto the observed data."""
    x_aug = jnp.concatenate([x, pend], axis=0)
    y_aug = jnp.concatenate([y, fant], axis=0)
    mask_aug = jnp.concatenate([mask, pend_mask], axis=0)
    return x_aug, y_aug, mask_aug
