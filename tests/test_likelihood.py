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
