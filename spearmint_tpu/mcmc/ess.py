"""Elliptical slice sampling (Murray, Adams & MacKay 2010), jittable.

Used by the constrained-EI chooser to sample the latent constraint
function under a GP prior with a probit likelihood (reference
``GPConstrainedEIChooser`` samples its latent values the same way,
SURVEY.md §2 #17 — mechanism marked [verify], this is the standard
construction).

One move: draw an ellipse through the current state and a prior sample,
then shrink the angle bracket until the log-likelihood beats a uniform
slice threshold.  The shrink loop provably decreases the bracket, so a
bounded ``lax.while_loop`` is exact in practice.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

MAX_SHRINK = 64


def elliptical_slice(
    key: jax.Array,
    f: jnp.ndarray,                 # (N,) current latent values
    prior_chol: jnp.ndarray,        # (N, N) chol of the GP prior cov
    log_lik: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """One ESS move of the latent vector f."""
    k_nu, k_h, k_theta, k_shrink = jax.random.split(key, 4)
    nu = prior_chol @ jax.random.normal(k_nu, f.shape, dtype=f.dtype)
    log_y = log_lik(f) + jnp.log(jax.random.uniform(k_h, dtype=f.dtype))

    theta = jax.random.uniform(
        k_theta, dtype=f.dtype, minval=0.0, maxval=2.0 * jnp.pi
    )
    lo = theta - 2.0 * jnp.pi
    hi = theta

    def proposal(th):
        return f * jnp.cos(th) + nu * jnp.sin(th)

    def cond(state):
        _, _, _, th, ok, steps = state
        return (~ok) & (steps < MAX_SHRINK)

    def body(state):
        k, lo, hi, th, _, steps = state
        f_prop = proposal(th)
        ok = log_lik(f_prop) > log_y
        lo = jnp.where(~ok & (th < 0.0), th, lo)
        hi = jnp.where(~ok & (th >= 0.0), th, hi)
        k, kd = jax.random.split(k)
        th_next = jnp.where(
            ok, th, lo + (hi - lo) * jax.random.uniform(kd, dtype=f.dtype)
        )
        return k, lo, hi, th_next, ok, steps + 1

    # run until accepted; seed the loop with the initial angle
    state = (k_shrink, lo, hi, theta, jnp.array(False), 0)
    _, _, _, th_final, ok, _ = lax.while_loop(cond, body, state)
    return jnp.where(ok, proposal(th_final), f)
