"""Jittable univariate stepping-out/shrinking slice sampler.

Parity: reference ``spearmint/spearmint/util.py::slice_sample`` ≈L30
(SURVEY.md §2 #7) — same algorithm (Neal 2003), same defaults
(sigma=1.0, step_out=True, max_steps_out=1000), same component-wise mode
with a random dimension ordering, same random-direction mode for joint
moves.  Differences forced by the XLA compilation model:

  * data-dependent loops become bounded ``lax.while_loop``s (the
    reference's step-out loop is already bounded by ``max_steps_out``;
    the shrink loop gets an explicit ``max_shrink`` cap, falling back to
    z=0, i.e. "stay put" — the reference raises instead);
  * randomness is an explicit ``jax.random`` key threaded through;
  * a NaN log-density is treated as −inf (a rejected point) instead of
    raising.

The whole sampler is pure → it vmaps over independent chains and pjits
over a ``chains`` mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

MAX_STEPS_OUT = 1000
MAX_SHRINK = 64  # shrink interval halves in expectation; 64 is plenty


def _direction_slice(
    key: jax.Array,
    x0: jnp.ndarray,
    direction: jnp.ndarray,
    logprob: Callable[[jnp.ndarray], jnp.ndarray],
    sigma: float,
    step_out: bool,
    max_steps_out: int,
    max_shrink: int,
    lp0: jnp.ndarray | None = None,
):
    """One slice-sampling move of x0 along ``direction``.

    Returns (x_new, logprob(x_new)).  ``lp0`` (the log density at x0, an
    O(n³) GP evaluation) is reused when the caller already knows it —
    each compwise sweep then pays one fewer Cholesky per dimension than
    the reference, with identical samples.
    """

    def dir_lp(z):
        lp = logprob(x0 + z * direction)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    k_u, k_h, k_shrink = jax.random.split(key, 3)
    upper0 = sigma * jax.random.uniform(k_u, dtype=x0.dtype)
    lower0 = upper0 - sigma
    if lp0 is None:
        lp0 = dir_lp(jnp.zeros((), x0.dtype))
    llh_s = jnp.log(jax.random.uniform(k_h, dtype=x0.dtype)) + lp0

    if step_out:
        # Guard: if the current point itself has −inf density (e.g. a
        # failed f32 factorization at large n), every finite bracket end
        # beats llh_s and step-out would burn max_steps_out × O(n³)
        # evaluations.  The slice is meaningless there — skip expansion
        # and let the shrink loop accept the first finite proposal.
        finite_slice = jnp.isfinite(llh_s)

        def lo_cond(state):
            lo, i = state
            return finite_slice & (dir_lp(lo) > llh_s) & (i < max_steps_out)

        def lo_body(state):
            lo, i = state
            return lo - sigma, i + 1

        lower, _ = lax.while_loop(lo_cond, lo_body, (lower0, 0))

        def up_cond(state):
            up, i = state
            return finite_slice & (dir_lp(up) > llh_s) & (i < max_steps_out)

        def up_body(state):
            up, i = state
            return up + sigma, i + 1

        upper, _ = lax.while_loop(up_cond, up_body, (upper0, 0))
    else:
        lower, upper = lower0, upper0

    def shrink_cond(state):
        _, _, _, _, _, done, steps = state
        return (~done) & (steps < max_shrink)

    def shrink_body(state):
        k, lo, up, z, llh, done, steps = state
        k, k_draw = jax.random.split(k)
        z_new = lo + (up - lo) * jax.random.uniform(k_draw, dtype=x0.dtype)
        llh_new = dir_lp(z_new)
        accept = llh_new > llh_s
        # Reference: rejected z<0 raises the lower bound, z>0 lowers the
        # upper bound (shrinkage toward 0, the current point).
        lo = jnp.where(~accept & (z_new < 0.0), z_new, lo)
        up = jnp.where(~accept & (z_new >= 0.0), z_new, up)
        z = jnp.where(accept, z_new, z)
        llh = jnp.where(accept, llh_new, llh)
        return k, lo, up, z, llh, accept, steps + 1

    zero = jnp.zeros((), x0.dtype)
    _, _, _, z_final, llh_final, accepted, _ = lax.while_loop(
        shrink_cond, shrink_body,
        (k_shrink, lower, upper, zero, lp0, False, 0)
    )
    # fallback (budget exhausted): stay at x0 whose density is lp0
    return x0 + z_final * direction, llh_final


@partial(
    jax.jit,
    static_argnames=("logprob", "sigma", "step_out", "max_steps_out",
                     "max_shrink", "compwise"),
)
def slice_sample(
    key: jax.Array,
    x0: jnp.ndarray,
    logprob: Callable[[jnp.ndarray], jnp.ndarray],
    sigma: float = 1.0,
    step_out: bool = True,
    max_steps_out: int = MAX_STEPS_OUT,
    max_shrink: int = MAX_SHRINK,
    compwise: bool = False,
) -> jnp.ndarray:
    """One slice-sampling sweep from x0 under ``logprob``.

    compwise=True: one move per coordinate, in a uniformly random order
    (reference's ARD length-scale mode).  compwise=False: a single move
    along a random direction on the unit sphere (reference's joint
    mean/amp2/noise mode).
    """
    x0 = jnp.asarray(x0)
    dim = x0.shape[0]
    if compwise:
        k_perm, k_moves = jax.random.split(key)
        order = jax.random.permutation(k_perm, dim)
        keys = jax.random.split(k_moves, dim)

        def body(carry, inp):
            x, lp = carry
            k, d = inp
            direction = (jnp.arange(dim) == d).astype(x0.dtype)
            x_new, lp_new = _direction_slice(
                k, x, direction, logprob, sigma, step_out, max_steps_out,
                max_shrink, lp0=lp,
            )
            return (x_new, lp_new), None

        lp_init = logprob(x0)
        lp_init = jnp.where(jnp.isnan(lp_init), -jnp.inf, lp_init)
        (x_final, _), _ = lax.scan(body, (x0, lp_init), (keys, order))
        return x_final
    else:
        k_dir, k_move = jax.random.split(key)
        direction = jax.random.normal(k_dir, (dim,), dtype=x0.dtype)
        direction = direction / jnp.sqrt(jnp.sum(direction**2))
        x_new, _ = _direction_slice(
            k_move, x0, direction, logprob, sigma, step_out, max_steps_out,
            max_shrink,
        )
        return x_new
