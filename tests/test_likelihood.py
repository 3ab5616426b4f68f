"""GP log-marginal: JAX masked vs NumPy golden, and prior terms."""

import jax.numpy as jnp
import numpy as np

from spearmint_tpu.core import priors
from spearmint_tpu.core.likelihood import GPHypers, log_marginal
from spearmint_tpu.golden import numpy_ref


def _pad(x, y, pad):
    n, d = x.shape
    xp = np.zeros((pad, d))
    xp[:n] = x
    yp = np.zeros(pad)
    yp[:n] = y
    mask = np.arange(pad) < n
    return xp, yp, mask


def test_log_marginal_matches_golden(rng):
    n, d, pad = 12, 3, 16
    x = rng.rand(n, d)
    y = rng.randn(n)
    mean, amp2, noise = 0.1, 1.3, 0.05
    ls = np.abs(rng.randn(d)) + 0.5
    want = numpy_ref.log_marginal(x, y, mean, amp2, noise, ls)
    xp, yp, mask = _pad(x, y, pad)
    got = float(
        log_marginal(
            jnp.array(xp), jnp.array(yp), jnp.array(mask),
            GPHypers(jnp.float32(mean), jnp.float32(amp2),
                     jnp.float32(noise), jnp.array(ls, jnp.float32)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_log_marginal_padding_invariant(rng):
    n, d = 9, 2
    x = rng.rand(n, d)
    y = rng.randn(n)
    h = lambda: GPHypers(jnp.float32(0.0), jnp.float32(1.0),
                         jnp.float32(0.01), jnp.ones(d, jnp.float32))
    outs = []
    for pad in (16, 32, 64):
        xp, yp, mask = _pad(x, y, pad)
        outs.append(float(log_marginal(jnp.array(xp), jnp.array(yp),
                                       jnp.array(mask), h())))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5)


def test_priors_match_reference_formulas():
    noise = 0.02
    want = np.log(np.log(1 + (0.1 / noise) ** 2))
    np.testing.assert_allclose(
        float(priors.horseshoe_logpdf(jnp.float32(noise))), want, rtol=1e-3)
    amp2 = 2.5
    want = -0.5 * (np.log(np.sqrt(amp2)) / 1.0) ** 2
    np.testing.assert_allclose(
        float(priors.lognormal_amp2_term(jnp.float32(amp2))), want, rtol=1e-3)
    assert bool(priors.ls_in_bounds(jnp.array([0.5, 1.9])))
    assert not bool(priors.ls_in_bounds(jnp.array([0.5, 2.1])))
    assert not bool(priors.ls_in_bounds(jnp.array([-0.1, 1.0])))


def test_log_marginal_matches_assembled_factorization(rng):
    """log_marginal's M-form evaluation (unit_cov_matrix + fma_logdet_q)
    is numerically the directly assembled chol→solve formula."""
    from spearmint_tpu.core import linalg
    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.core.likelihood import cov_matrix

    n, d, pad = 11, 2, 16
    x = rng.rand(n, d)
    y = rng.randn(n)
    xp, yp, mask = _pad(x, y, pad)
    xj, yj, mj = jnp.array(xp, jnp.float32), jnp.array(yp, jnp.float32), jnp.array(mask)
    ls = jnp.array(np.abs(rng.randn(d)) + 0.5, jnp.float32)
    for mean, amp2, noise in [(0.0, 1.0, 1e-3), (0.2, 2.5, 0.05), (-0.3, 0.4, 0.7)]:
        got = float(log_marginal(
            xj, yj, mj,
            GPHypers(jnp.float32(mean), jnp.float32(amp2),
                     jnp.float32(noise), ls)))
        k = cov_matrix(xj, mj, jnp.float32(amp2), jnp.float32(noise), ls,
                       matern52)
        chol = linalg.cholesky(k)
        resid = jnp.where(mj, yj - mean, 0.0)
        w = linalg.tri_solve(chol, resid)
        want = float(-linalg.logdet_from_chol(chol)
                     - 0.5 * jnp.dot(w, w))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tri_solve_blocked_matches_xla():
    """Blocked single-RHS forward substitution (hot-loop trisolve) vs
    XLA's solve_triangular, including under vmap."""
    import jax

    from spearmint_tpu.core import linalg

    rng = np.random.RandomState(3)
    for n in (1024, 1280, 2560):
        a = rng.randn(n, 8).astype(np.float32)
        k = a @ a.T * 0.01 + np.eye(n, dtype=np.float32)
        chol = np.linalg.cholesky(k)
        b = rng.randn(n).astype(np.float32)
        ref = np.asarray(linalg.tri_solve(jnp.array(chol), jnp.array(b)))
        out = np.asarray(linalg.tri_solve_1rhs(jnp.array(chol),
                                               jnp.array(b)))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    # batched (the chains axis)
    chols = jnp.broadcast_to(jnp.array(chol), (3, n, n))
    bs = jnp.array(rng.randn(3, n).astype(np.float32))
    rv = np.asarray(jax.vmap(linalg.tri_solve)(chols, bs))
    bv = np.asarray(jax.vmap(linalg.tri_solve_1rhs)(chols, bs))
    np.testing.assert_allclose(bv, rv, rtol=2e-5, atol=2e-5)
