"""Hyperparameter priors, exactly as the reference choosers roll them in.

Parity (SURVEY.md §3.2, GPEIOptChooser ≈L200-260):

  * noise   — horseshoe: lp += log(log(1 + (noise_scale/noise)²)),
              noise_scale = 0.1
  * amp2    — lognormal: lp −= ½·(log(√amp2)/amp2_scale)², amp2_scale = 1
  * ls      — tophat on (0, max_ls], max_ls = 2
  * mean    — flat, constrained to [min(y), max(y)]

Getting these *exactly* right is required for posterior-moment parity with
the reference (SURVEY.md hard part #6).
"""

from __future__ import annotations

import jax.numpy as jnp

NOISE_SCALE = 0.1   # horseshoe scale on the noise variance
AMP2_SCALE = 1.0    # lognormal scale on the amplitude
MAX_LS = 2.0        # tophat upper bound on ARD length scales
DEFAULT_NOISE = 1e-3  # fixed noise in noiseless mode / initial value


def horseshoe_logpdf(noise: jnp.ndarray, scale: float = NOISE_SCALE) -> jnp.ndarray:
    """Unnormalized horseshoe density used by the reference for noise."""
    return jnp.log(jnp.log(1.0 + (scale / noise) ** 2))


def lognormal_amp2_term(amp2: jnp.ndarray, scale: float = AMP2_SCALE) -> jnp.ndarray:
    """−½ (log √amp2 / scale)², added to the log posterior."""
    return -0.5 * (jnp.log(jnp.sqrt(amp2)) / scale) ** 2


def ls_in_bounds(ls: jnp.ndarray, max_ls: float = MAX_LS) -> jnp.ndarray:
    """Tophat support indicator for ARD length scales."""
    return jnp.all((ls > 0.0) & (ls <= max_ls))


def mean_in_bounds(mean, y_min, y_max) -> jnp.ndarray:
    """Reference clamps the constant mean inside the observed value range."""
    return (mean >= y_min) & (mean <= y_max)
