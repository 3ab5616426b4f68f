"""Batched projected L-BFGS vs scipy fmin_l_bfgs_b on smooth box problems."""

import jax.numpy as jnp
import numpy as np
import scipy.optimize as spo

from spearmint_tpu.acquire.optimize import minimize_lbfgs_b


def test_quadratic_interior():
    target = jnp.array([0.3, 0.7])
    fun = lambda x: jnp.sum((x - target) ** 2)
    res = minimize_lbfgs_b(fun, jnp.array([[0.9, 0.1]]), jnp.zeros(2), jnp.ones(2),
                           iters=60)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(target), atol=1e-4)


def test_optimum_on_boundary():
    # unconstrained min at (-1, 2) → box min at (0, 1)
    fun = lambda x: (x[0] + 1.0) ** 2 + (x[1] - 2.0) ** 2
    res = minimize_lbfgs_b(fun, jnp.array([[0.5, 0.5]]), jnp.zeros(2), jnp.ones(2),
                           iters=60)
    np.testing.assert_allclose(np.asarray(res.x[0]), [0.0, 1.0], atol=1e-4)


def test_rosenbrock_matches_scipy(rng):
    def rosen_np(x):
        return float(100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2)

    def rosen_jax(x):
        return 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2

    starts = rng.rand(6, 2).astype(np.float32)
    res = minimize_lbfgs_b(rosen_jax, jnp.array(starts), jnp.zeros(2), jnp.ones(2),
                           iters=200, history=10)
    best = float(jnp.min(res.fun))
    sp_best = min(
        spo.fmin_l_bfgs_b(rosen_np, s, approx_grad=True,
                          bounds=[(0, 1), (0, 1)])[1]
        for s in starts
    )
    # global min (1,1) is a box corner, f=0
    assert best <= sp_best + 1e-3
    assert best < 1e-4


def test_batched_starts_pick_distinct_basins():
    # double-well along x: minima near x=0.2 and x=0.8
    fun = lambda x: ((x[0] - 0.2) ** 2) * ((x[0] - 0.8) ** 2) + x[1] ** 2
    starts = jnp.array([[0.1, 0.5], [0.9, 0.5]])
    res = minimize_lbfgs_b(fun, starts, jnp.zeros(2), jnp.ones(2), iters=100)
    xs = np.asarray(res.x)[:, 0]
    assert abs(xs[0] - 0.2) < 0.05 and abs(xs[1] - 0.8) < 0.05


def test_bound_active_quadratics_match_scipy(rng):
    """Random quadratics with minima outside the box: the active-set
    step must land on the same bound-active solution scipy finds."""
    import jax

    d = 4
    for trial in range(5):
        a = rng.randn(d, d).astype(np.float64)
        q = a @ a.T + d * np.eye(d)          # SPD
        center = 1.5 * rng.randn(d)           # usually outside [0,1]^d

        def f_np(x):
            r = x - center
            return float(0.5 * r @ q @ r)

        def g_np(x):
            return q @ (x - center)

        qj = jnp.array(q)
        cj = jnp.array(center)
        f_jax = lambda x: 0.5 * (x - cj) @ qj @ (x - cj)

        x0 = rng.rand(d)
        want_x, want_f, info = spo.fmin_l_bfgs_b(
            f_np, x0.copy(), fprime=g_np, bounds=[(0, 1)] * d)
        with jax.enable_x64(True):
            res = minimize_lbfgs_b(
                f_jax, jnp.array(x0)[None], jnp.zeros(d), jnp.ones(d),
                iters=100)
        np.testing.assert_allclose(np.asarray(res.x[0]), want_x,
                                   atol=5e-5, err_msg=f"trial {trial}")
        assert float(res.fun[0]) <= want_f + 1e-6 * max(1.0, abs(want_f))


def test_active_set_does_not_stick_interior_optimum():
    # starts ON the boundary with inward gradient must still move inside
    fun = lambda x: jnp.sum((x - 0.5) ** 2)
    starts = jnp.array([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    res = minimize_lbfgs_b(fun, starts, jnp.zeros(2), jnp.ones(2), iters=50)
    np.testing.assert_allclose(np.asarray(res.x),
                               0.5 * np.ones((3, 2)), atol=1e-4)
