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

# Loop budgets, cited to measurement (bin/profile_slice_counts.py on
# the flagship config, n=5000 × 10 chains from un-burned states — the
# worst-count regime; docs/PROFILE_r4.md):
#   * step-out expansions: p99 = 1, max = 1 — the reference's
#     max_steps_out=1000 never binds; kept verbatim for parity.
#   * shrink evaluations: p99.9 = 28 (joint move), 18 (ls components);
#     MAX_SHRINK = 64 ≈ 2.3× the worst observed p99.9.  The cap exists
#     only because the reference's unbounded shrink loop cannot be
#     compiled (lax.while_loop needs a bound for the z=0 fallback);
#     it costs nothing when unused — the loop exits on acceptance.
MAX_STEPS_OUT = 1000
MAX_SHRINK = 64


# Phase machine for the single-call-site move loop.
_PH_LO, _PH_UP, _PH_SHRINK, _PH_DONE = 0, 1, 2, 3


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

    The reference's three data-dependent loops (step-out lower, step-out
    upper, shrink) run here as ONE ``lax.while_loop`` phase machine with
    a single textual ``logprob`` call site.  Same evaluation sequence
    per chain, two structural wins on TPU:

      * under a chains-``vmap`` the batched loop runs
        max_chains(lo+up+shrink evals) iterations instead of
        max(lo) + max(up) + max(shrink) — strictly fewer serialized
        O(n³) evaluations in lockstep;
      * the O(n³) likelihood body is traced ONCE per move instead of
        3× (and once more in each loop's cond), shrinking the HLO and
        compile time of the full sweep ~3×.
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

    # Guard: if the current point itself has −inf density (e.g. a failed
    # f32 factorization at large n), every finite bracket end beats
    # llh_s and step-out would burn max_steps_out × O(n³) evaluations.
    # The slice is meaningless there — skip expansion and let the shrink
    # phase accept the first finite proposal.
    finite_slice = jnp.isfinite(llh_s)
    if step_out:
        phase0 = jnp.where(finite_slice, _PH_LO, _PH_SHRINK).astype(jnp.int32)
    else:
        phase0 = jnp.asarray(_PH_SHRINK, jnp.int32)

    zero = jnp.zeros((), x0.dtype)

    def cond(st):
        return st[0] < _PH_DONE

    def body(st):
        phase, lo, up, z, llh, i_lo, i_up, i_sh = st
        # Shrink draw (consumed only in the shrink phase); keyed by the
        # draw counter so phases 0/1 don't advance the stream.
        u = jax.random.uniform(
            jax.random.fold_in(k_shrink, i_sh), dtype=x0.dtype)
        z_prop = lo + (up - lo) * u
        in_lo = phase == _PH_LO
        in_up = phase == _PH_UP
        in_sh = phase == _PH_SHRINK
        pt = jnp.where(in_lo, lo, jnp.where(in_up, up, z_prop))
        lp = dir_lp(pt)  # THE single O(n³) call site of the whole move
        above = lp > llh_s

        expand_lo = in_lo & above & (i_lo < max_steps_out)
        leave_lo = in_lo & ~expand_lo
        expand_up = in_up & above & (i_up < max_steps_out)
        leave_up = in_up & ~expand_up
        accept = in_sh & above
        reject = in_sh & ~above
        exhausted = reject & (i_sh + 1 >= max_shrink)

        lo = jnp.where(expand_lo, lo - sigma, lo)
        up = jnp.where(expand_up, up + sigma, up)
        # Reference: rejected z<0 raises the lower bound, z>=0 lowers
        # the upper bound (shrinkage toward 0, the current point).
        lo = jnp.where(reject & (z_prop < 0.0), z_prop, lo)
        up = jnp.where(reject & (z_prop >= 0.0), z_prop, up)
        z = jnp.where(accept, z_prop, z)
        llh = jnp.where(accept, lp, llh)

        phase = jnp.where(leave_lo, _PH_UP, phase)
        phase = jnp.where(leave_up, _PH_SHRINK, phase)
        phase = jnp.where(accept | exhausted, _PH_DONE, phase)
        phase = phase.astype(jnp.int32)
        return (phase, lo, up, z, llh,
                i_lo + expand_lo.astype(jnp.int32),
                i_up + expand_up.astype(jnp.int32),
                i_sh + in_sh.astype(jnp.int32))

    # fallback (shrink budget exhausted): z=0, i.e. stay at x0 (density
    # lp0) — the reference raises instead.
    zi = jnp.asarray(0, jnp.int32)
    _, _, _, z_final, llh_final, n_lo, n_up, n_sh = lax.while_loop(
        cond, body,
        (phase0, lower0, upper0, zero, lp0, zi, zi, zi),
    )
    counts = jnp.stack([n_lo, n_up, n_sh])
    return x0 + z_final * direction, llh_final, counts


@partial(
    jax.jit,
    static_argnames=("logprob", "sigma", "step_out", "max_steps_out",
                     "max_shrink", "compwise", "with_lp", "with_counts"),
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
    lp0: jnp.ndarray | None = None,
    with_lp: bool = False,
    with_counts: bool = False,
):
    """One slice-sampling sweep from x0 under ``logprob``.

    compwise=True: one move per coordinate, in a uniformly random order
    (reference's ARD length-scale mode).  compwise=False: a single move
    along a random direction on the unit sphere (reference's joint
    mean/amp2/noise mode).

    ``lp0``: the caller's known value of ``logprob(x0)`` — skips the
    initial O(n³) evaluation (chains.sample_hypers carries it across
    the joint→ls→next-sweep sequence).  ``with_lp=True`` additionally
    returns ``logprob`` at the returned point, enabling that carry.

    ``with_counts=True`` appends the move's loop counters — int32
    [3] (lower step-outs, upper step-outs, shrink evaluations), or
    [D, 3] compwise — for budget/lockstep instrumentation
    (bin/profile_slice_counts.py; each move's total logprob evals =
    lo + up + sh + 2 when stepping out on a finite slice, sh when the
    expansion was skipped).
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
            x_new, lp_new, counts = _direction_slice(
                k, x, direction, logprob, sigma, step_out, max_steps_out,
                max_shrink, lp0=lp,
            )
            return (x_new, lp_new), counts

        if lp0 is None:
            lp0 = logprob(x0)
        lp_init = jnp.where(jnp.isnan(lp0), -jnp.inf, lp0)
        (x_final, lp_final), counts = lax.scan(
            body, (x0, lp_init), (keys, order))
        out = (x_final,)
        if with_lp:
            out += (lp_final,)
        if with_counts:
            out += (counts,)
        return out if len(out) > 1 else x_final
    else:
        k_dir, k_move = jax.random.split(key)
        direction = jax.random.normal(k_dir, (dim,), dtype=x0.dtype)
        direction = direction / jnp.sqrt(jnp.sum(direction**2))
        if lp0 is not None:
            lp0 = jnp.where(jnp.isnan(lp0), -jnp.inf, lp0)
        x_new, lp_new, counts = _direction_slice(
            k_move, x0, direction, logprob, sigma, step_out, max_steps_out,
            max_shrink, lp0=lp0,
        )
        out = (x_new,)
        if with_lp:
            out += (lp_new,)
        if with_counts:
            out += (counts,)
        return out if len(out) > 1 else x_new
