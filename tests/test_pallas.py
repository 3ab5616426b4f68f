"""Pallas fused Matérn kernel vs the jnp reference path (interpret mode
on CPU; same code compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from spearmint_tpu.core.kernels import get_kernel, matern52
from spearmint_tpu.ops.pallas_kernels import matern52_pallas, pallas_supported


def test_matches_jnp_path(rng):
    x1 = jnp.array(rng.rand(256, 3), jnp.float32)
    x2 = jnp.array(rng.rand(128, 3), jnp.float32)
    ls = jnp.array([0.5, 1.0, 1.5], jnp.float32)
    got = np.asarray(matern52_pallas(x1, x2, ls, amp2=2.0))
    want = np.asarray(2.0 * matern52(x1, x2, ls))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fallback_on_untiled_shapes(rng):
    x1 = jnp.array(rng.rand(100, 2), jnp.float32)
    x2 = jnp.array(rng.rand(50, 2), jnp.float32)
    assert not pallas_supported(x1, x2)
    got = np.asarray(matern52_pallas(x1, x2, jnp.ones(2)))
    want = np.asarray(matern52(x1, x2, jnp.ones(2)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_vmap_over_length_scales(rng):
    x = jnp.array(rng.rand(128, 2), jnp.float32)
    lsb = jnp.array(rng.rand(4, 2) + 0.5, jnp.float32)
    got = np.asarray(jax.vmap(lambda l: matern52_pallas(x, x, l))(lsb))
    want = np.asarray(jax.vmap(lambda l: matern52(x, x, l))(lsb))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_registry_and_suggest_integration(rng):
    """A full suggest step with kernel_name=Matern52Pallas runs and
    agrees with the stock kernel on EI ordering."""
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states, suggest_step,
    )

    assert get_kernel("Matern52Pallas") is not None
    n, pad, c = 20, 128, 128  # pallas-tilable bucket
    x = rng.rand(n, 2).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + 0.05 * rng.randn(n)).astype(np.float32)
    xp = np.zeros((pad, 2), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = jnp.array(np.arange(pad) < n)
    cand = jnp.array(rng.rand(c, 2), jnp.float32)
    args = (jnp.array(xp), jnp.array(yp), mask,
            jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
            cand, jnp.ones(c, bool))
    h = init_chain_states(jnp.array(yp), mask, 2, chains=2)
    key = jax.random.PRNGKey(0)
    res_p = suggest_step(key, h, *args, SuggestConfig(
        mcmc_iters=2, optimize=False, kernel_name="Matern52Pallas"))
    res_j = suggest_step(key, h, *args, SuggestConfig(
        mcmc_iters=2, optimize=False, kernel_name="Matern52"))
    # same RNG stream; slice-sampling accept decisions may diverge only
    # if f32 roundoff flips a comparison — EI landscapes stay aligned
    corr = np.corrcoef(np.asarray(res_p.ei), np.asarray(res_j.ei))[0, 1]
    assert corr > 0.99, corr


def test_pallas_cholesky_matches_xla(rng):
    from spearmint_tpu.ops.pallas_chol import cholesky_pallas

    x = rng.randn(2, 512, 512).astype(np.float32) / np.sqrt(512)
    a = x @ np.transpose(x, (0, 2, 1)) + 0.5 * np.eye(512, dtype=np.float32)
    got = np.asarray(cholesky_pallas(jnp.array(a), block=256))
    want = np.linalg.cholesky(a)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_cholesky_engine_switch(rng):
    """Flip the global chol backend and run a full suggest step."""
    from spearmint_tpu.core import linalg
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states, suggest_step,
    )

    n, pad, c = 20, 512, 64
    x = rng.rand(n, 2).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + 0.05 * rng.randn(n)).astype(np.float32)
    xp = np.zeros((pad, 2), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = jnp.array(np.arange(pad) < n)
    cand = jnp.array(rng.rand(c, 2), jnp.float32)
    args = (jnp.array(xp), jnp.array(yp), mask,
            jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
            cand, jnp.ones(c, bool))
    h = init_chain_states(jnp.array(yp), mask, 2, chains=2)
    cfg = SuggestConfig(mcmc_iters=1, optimize=False)
    base = suggest_step(jax.random.PRNGKey(0), h, *args, cfg)
    linalg.set_pallas_cholesky(True)
    try:
        jax.clear_caches()  # trace-time flag: force retrace
        got = suggest_step(jax.random.PRNGKey(0), h, *args, cfg)
    finally:
        linalg.set_pallas_cholesky(False)
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(got.ei), np.asarray(base.ei),
                               rtol=1e-3, atol=1e-6)
