"""Kernels vs closed forms + masked linalg exactness (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.core import kernels, linalg
from spearmint_tpu.golden import numpy_ref


def test_matern52_closed_form(rng):
    x1 = rng.randn(7, 3)
    x2 = rng.randn(5, 3)
    ls = np.abs(rng.randn(3)) + 0.5
    got = np.asarray(kernels.matern52(jnp.array(x1), jnp.array(x2), jnp.array(ls)))
    want = numpy_ref.matern52(x1, x2, ls)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_matern52_diag_is_one(rng):
    x = rng.randn(6, 2)
    k = np.asarray(kernels.matern52(jnp.array(x), jnp.array(x), jnp.ones(2)))
    np.testing.assert_allclose(np.diag(k), 1.0, atol=1e-6)
    # symmetric PSD
    np.testing.assert_allclose(k, k.T, atol=1e-6)
    assert np.linalg.eigvalsh(k + 1e-6 * np.eye(6)).min() > 0


def test_matmul_path_matches_direct(rng):
    d = kernels._MATMUL_MIN_DIM
    x1 = rng.rand(9, d)
    x2 = rng.rand(4, d)
    ls = np.abs(rng.randn(d)) + 0.5
    got = np.asarray(kernels.ard_sqdist(jnp.array(x1), jnp.array(x2), jnp.array(ls)))
    a, b = x1 / ls, x2 / ls
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    # f32 ‖a‖²+‖b‖²−2ab expansion loses ~3 digits to cancellation; the
    # direct path (used for BO-sized D) is exact.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kernel_grad_at_zero_distance_is_zero():
    x = jnp.array([[0.3, 0.7]])
    g = jax.grad(lambda z: kernels.matern52(z[None], x, jnp.ones(2))[0, 0])(x[0])
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_get_kernel_registry():
    assert kernels.get_kernel("Matern52") is kernels.matern52
    with pytest.raises(ValueError):
        kernels.get_kernel("nope")


def test_masked_cholesky_matches_unmasked(rng):
    n, pad = 10, 16
    x = rng.rand(n, 2)
    k_small = numpy_ref.matern52(x, x, np.ones(2)) + 0.01 * np.eye(n)
    x_pad = np.zeros((pad, 2))
    x_pad[:n] = x
    k_raw = numpy_ref.matern52(x_pad, x_pad, np.ones(2)) + 0.01 * np.eye(pad)
    mask = np.arange(pad) < n
    chol = np.asarray(linalg.masked_cholesky(jnp.array(k_raw), jnp.array(mask)))
    want = np.linalg.cholesky(k_small)
    np.testing.assert_allclose(chol[:n, :n], want, rtol=1e-4, atol=1e-5)
    # padded block is exactly identity
    np.testing.assert_allclose(chol[n:, n:], np.eye(pad - n), atol=1e-6)
    np.testing.assert_allclose(chol[n:, :n], 0.0, atol=1e-6)
    # logdet ignores padding
    got_ld = float(linalg.logdet_from_chol(jnp.array(chol)))
    want_ld = np.sum(np.log(np.diag(want)))
    np.testing.assert_allclose(got_ld, want_ld, rtol=1e-4)


def test_masked_stats(rng):
    x = rng.randn(8)
    mask = np.array([True] * 5 + [False] * 3)
    np.testing.assert_allclose(
        float(linalg.masked_mean(jnp.array(x), jnp.array(mask))),
        x[:5].mean(), rtol=1e-6)
    np.testing.assert_allclose(
        float(linalg.masked_std(jnp.array(x), jnp.array(mask))),
        x[:5].std(), rtol=1e-5)
    np.testing.assert_allclose(
        float(linalg.masked_min(jnp.array(x), jnp.array(mask))), x[:5].min())
    np.testing.assert_allclose(
        float(linalg.masked_max(jnp.array(x), jnp.array(mask))), x[:5].max())


def test_pad_bucket():
    assert linalg.pad_bucket(1) == 16
    assert linalg.pad_bucket(16) == 16
    assert linalg.pad_bucket(17) == 20
    assert linalg.pad_bucket(25) == 28
    assert linalg.pad_bucket(40) == 40
    assert linalg.pad_bucket(5000) == 5120
    assert linalg.pad_bucket(10000) == 10240
    # monotone, always >= n, waste <= 25% linear
    prev = 0
    for n in range(1, 20000, 37):
        b = linalg.pad_bucket(n)
        assert b >= n and b >= prev
        assert b <= max(16, (n * 5 + 3) // 4)
        prev = b
    # every production-scale bucket is MXU-tile and obs-mesh aligned
    for n in range(512, 20000, 411):
        assert linalg.pad_bucket(n) % 128 == 0
