"""Batched box-constrained L-BFGS for on-chip acquisition optimization.

Replaces the reference's host-side ``scipy.optimize.fmin_l_bfgs_b`` over a
``multiprocessing.Pool`` of candidate starts (``GPEIOptChooser`` ≈L250,
SURVEY.md §3.2) with a jittable, vmappable projected L-BFGS:

  * fixed iteration count via ``lax.scan`` (static shapes, no host sync);
  * limited-memory two-loop recursion with a circular (s, y) history;
  * Armijo backtracking line search along the projected path;
  * all restarts advance in lockstep as one batched computation — on TPU
    the EI objective batches over starts into single MXU-sized solves
    instead of scipy's one-point-at-a-time loop.

Bound handling follows L-BFGS-B's gradient-projection idea: variables
pinned at a bound with an outward gradient are frozen each iteration and
the quasi-Newton direction is taken in the free subspace (no generalized
Cauchy-point subspace minimization — the projected Armijo ladder plays
that role).  ``tests/test_optimize.py`` checks parity against scipy's
fmin_l_bfgs_b on smooth and bound-active box problems.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    converged: jnp.ndarray


def _two_loop(g, s_hist, y_hist, rho_hist, valid):
    """L-BFGS two-loop recursion with masked (possibly unfilled) history."""
    m = s_hist.shape[0]

    def bwd(carry, i):
        q, alphas = carry
        a = rho_hist[i] * jnp.dot(s_hist[i], q)
        a = jnp.where(valid[i], a, 0.0)
        q = q - a * y_hist[i]
        return (q, alphas.at[i].set(a)), None

    (q, alphas), _ = lax.scan(
        bwd, (g, jnp.zeros(m, g.dtype)), jnp.arange(m - 1, -1, -1)
    )

    # Initial Hessian scaling γ = sᵀy / yᵀy from the newest valid pair.
    newest = m - 1
    sy = jnp.dot(s_hist[newest], y_hist[newest])
    yy = jnp.dot(y_hist[newest], y_hist[newest])
    gamma = jnp.where(valid[newest] & (yy > 0), sy / jnp.maximum(yy, 1e-20), 1.0)
    r = gamma * q

    def fwd(r, i):
        b = rho_hist[i] * jnp.dot(y_hist[i], r)
        b = jnp.where(valid[i], b, 0.0)
        r = r + (alphas[i] - b) * s_hist[i]
        return r, None

    r, _ = lax.scan(fwd, r, jnp.arange(m))
    return r  # approximates H·g


def _lbfgs_single(
    fun: Callable,
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    iters: int,
    history: int,
    tol: float,
    max_ls: int,
):
    dtype = x0.dtype
    dim = x0.shape[0]
    vg = jax.value_and_grad(fun)

    def project(x):
        return jnp.clip(x, lower, upper)

    x0 = project(x0)
    f0, g0 = vg(x0)

    class _State(NamedTuple):
        x: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        s_hist: jnp.ndarray
        y_hist: jnp.ndarray
        rho_hist: jnp.ndarray
        valid: jnp.ndarray
        done: jnp.ndarray

    init = _State(
        x=x0, f=f0, g=g0,
        s_hist=jnp.zeros((history, dim), dtype),
        y_hist=jnp.zeros((history, dim), dtype),
        rho_hist=jnp.zeros((history,), dtype),
        valid=jnp.zeros((history,), bool),
        done=jnp.array(False),
    )

    # Parallel line search: one batched evaluation at a fixed step
    # ladder per iteration instead of sequential backtracking.  Under
    # vmap over restarts a while-loop line search makes every lane pay
    # the slowest lane's trial count; a ladder is one fused batch on the
    # MXU and is deterministic.  ``max_ls`` controls the ladder depth.
    n_steps = min(max_ls, 8)
    ladder = jnp.asarray(
        [2.0 ** (-i) for i in range(0, 2 * n_steps, 2)], dtype
    )  # 1, 1/4, 1/16, ...

    # Bound-activity tolerance for the active-set identification.
    bound_eps = 10.0 * jnp.finfo(dtype).eps * jnp.maximum(
        1.0, jnp.max(upper - lower))

    def step(st: _State, _):
        # Active-set identification (the L-BFGS-B gradient-projection
        # idea, scipy parity): a variable pinned at a bound whose
        # gradient points outward is frozen this step, and the two-loop
        # direction is computed in the free subspace — otherwise the
        # quasi-Newton direction drags bound-active coordinates back
        # into the interior and the iteration zigzags along the face.
        at_lo = (st.x <= lower + bound_eps) & (st.g > 0)
        at_hi = (st.x >= upper - bound_eps) & (st.g < 0)
        active = at_lo | at_hi
        g_free = jnp.where(active, 0.0, st.g)
        d = -_two_loop(g_free, st.s_hist, st.y_hist, st.rho_hist, st.valid)
        d = jnp.where(active, 0.0, d)
        # Ensure descent; fall back to steepest descent otherwise.
        descent = jnp.dot(d, g_free) < 0
        d = jnp.where(descent, d, -g_free)

        x_trys = jax.vmap(lambda t: project(st.x + t * d))(ladder)
        f_trys = jax.vmap(fun)(x_trys)
        armijo = f_trys <= st.f + 1e-4 * (x_trys - st.x) @ st.g
        # largest step satisfying Armijo; else the plain minimizer
        first_ok = jnp.argmax(armijo)  # ladder is sorted descending
        any_ok = jnp.any(armijo)
        pick = jnp.where(any_ok, first_ok, jnp.argmin(f_trys))
        ls_ok = any_ok | (f_trys[pick] < st.f)
        x_new = jnp.where(ls_ok, x_trys[pick], st.x)
        f_new, g_new = vg(x_new)
        improved = f_new < st.f
        x_new = jnp.where(improved, x_new, st.x)
        f_new = jnp.where(improved, f_new, st.f)
        g_new = jnp.where(improved, g_new, st.g)

        s = x_new - st.x
        yv = g_new - st.g
        sy = jnp.dot(s, yv)
        keep = improved & (sy > 1e-10)
        s_hist = jnp.where(keep, jnp.roll(st.s_hist, -1, 0).at[-1].set(s), st.s_hist)
        y_hist = jnp.where(keep, jnp.roll(st.y_hist, -1, 0).at[-1].set(yv), st.y_hist)
        rho_hist = jnp.where(
            keep, jnp.roll(st.rho_hist, -1, 0).at[-1].set(1.0 / sy), st.rho_hist
        )
        valid = jnp.where(keep, jnp.roll(st.valid, -1, 0).at[-1].set(True), st.valid)

        # Projected-gradient convergence test.
        pg = x_new - project(x_new - g_new)
        done = st.done | (jnp.max(jnp.abs(pg)) < tol) | (~improved & ~ls_ok)

        new_st = _State(x_new, f_new, g_new, s_hist, y_hist, rho_hist, valid, done)
        # Freeze converged lanes (cheap: results identical once done).
        frozen = jax.tree.map(lambda a, b: jnp.where(st.done, a, b), st, new_st)
        return frozen, None

    final, _ = lax.scan(step, init, None, length=iters)
    return LBFGSResult(x=final.x, fun=final.f, converged=final.done)


@partial(
    jax.jit,
    static_argnames=("fun", "iters", "history", "tol", "max_ls"),
)
def minimize_lbfgs_b(
    fun: Callable,
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    iters: int = 50,
    history: int = 10,
    tol: float = 1e-6,
    max_ls: int = 20,
) -> LBFGSResult:
    """Minimize ``fun`` from a batch of starts inside a box.

    x0: (B, D) starts (or (D,) for a single start); bounds broadcast.
    Returns per-start optima; callers typically take the argmin lane.
    """
    single = x0.ndim == 1
    x0b = x0[None] if single else x0
    lower = jnp.broadcast_to(lower, x0b.shape[-1:])
    upper = jnp.broadcast_to(upper, x0b.shape[-1:])
    run = lambda x: _lbfgs_single(fun, x, lower, upper, iters, history, tol, max_ls)
    res = jax.vmap(run)(x0b)
    if single:
        res = LBFGSResult(res.x[0], res.fun[0], res.converged[0])
    return res
