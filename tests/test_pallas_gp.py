"""Fused GP logdet+quadratic kernel (ops/pallas_gp) — interpret-mode tests.

The production dispatch (linalg.chol_logdet_q) only routes to the Pallas
kernel on real TPU backends; these tests run the same kernel code in the
Pallas TPU interpreter at small shapes, so CI (CPU) exercises the full
manual-DMA factorization logic.  TPU-scale correctness and performance
are recorded in docs/PROFILE_r3.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spearmint_tpu.core import linalg
from spearmint_tpu.ops.pallas_gp import logdet_q_pallas


def _reference(kmat, resid):
    chol = np.linalg.cholesky(np.asarray(kmat))
    ld = np.sum(np.log(np.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    w = np.stack([
        np.linalg.solve(np.tril(c), r)
        for c, r in zip(chol, np.asarray(resid))
    ])
    return ld, np.sum(w * w, axis=-1)


def _case(k_batch, n, npad=0, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((k_batch, n, 8)).astype(np.float32)
    km = np.einsum("knd,kmd->knm", feats, feats) / 8
    km += 0.5 * np.eye(n, dtype=np.float32)
    r = rng.standard_normal((k_batch, n)).astype(np.float32)
    if npad:
        mask = np.ones(n, bool)
        mask[n - npad:] = False
        both = mask[:, None] & mask[None, :]
        km = np.where(both, km, np.eye(n, dtype=np.float32))
        r = np.where(mask, r, 0.0)
    return jnp.asarray(km), jnp.asarray(r)


@pytest.mark.parametrize(
    "k_batch,n,npad", [(2, 256, 0), (3, 384, 37), (1, 256, 0)]
)
def test_kernel_matches_dense_reference(k_batch, n, npad):
    km, r = _case(k_batch, n, npad, seed=n)
    ld, q = logdet_q_pallas(km, r, block=128, sub=32, interpret=True)
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(q, q0, rtol=2e-3, atol=2e-3)


def test_kernel_nan_propagation_per_batch_lane():
    """A non-PSD matrix in one lane NaNs that lane's outputs only."""
    km, r = _case(2, 256)
    km = km.at[0].set(-km[0])
    ld, q = logdet_q_pallas(km, r, block=128, sub=32, interpret=True)
    assert bool(jnp.isnan(ld[0])) and bool(jnp.isnan(q[0]))
    ld0, q0 = _reference(km[1:], r[1:])
    np.testing.assert_allclose(ld[1], ld0[0], rtol=2e-4)
    np.testing.assert_allclose(q[1], q0[0], rtol=2e-3)


def test_kernel_batch_chunking():
    """Batches beyond MAX_BATCH chunk+pad without changing results."""
    from spearmint_tpu.ops import pallas_gp

    km, r = _case(5, 256, seed=7)
    old = pallas_gp.MAX_BATCH
    pallas_gp.MAX_BATCH = 2  # force 3 chunks with a padded tail
    try:
        ld, q = logdet_q_pallas(km, r, block=128, sub=32, interpret=True)
    finally:
        pallas_gp.MAX_BATCH = old
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(q, q0, rtol=2e-3, atol=2e-3)


def test_shifted_kernel_rescale_matches_assembled_form():
    """Shift-trick evaluation of K = amp2·m0 + diag(dadd): factoring the
    shifted unit matrix and rescaling analytically must reproduce the
    assembled-covariance result, padded rows included."""
    from spearmint_tpu.ops.pallas_gp import shifted_logdet_q_pallas

    rng = np.random.default_rng(5)
    k_batch, n, npad = 3, 384, 21
    feats = rng.standard_normal((k_batch, n, 8)).astype(np.float32)
    m0 = np.einsum("knd,kmd->knm", feats, feats) / 8
    m0 += 1e-3 * np.eye(n, dtype=np.float32)
    mask = np.ones(n, bool)
    mask[n - npad:] = False
    both = mask[:, None] & mask[None, :]
    m0 = np.where(both, m0, 0.0).astype(np.float32)
    amp2 = rng.uniform(0.5, 2.0, k_batch).astype(np.float32)
    noise = rng.uniform(0.1, 0.5, k_batch).astype(np.float32)
    dadd = np.where(mask, noise[:, None], 1.0).astype(np.float32)
    r = np.where(mask, rng.standard_normal((k_batch, n)), 0.0).astype(
        np.float32)
    km = (amp2[:, None, None] * m0
          + dadd[:, :, None] * np.eye(n, dtype=np.float32))
    ld_t, q_t = shifted_logdet_q_pallas(
        jnp.asarray(m0), jnp.asarray(dadd / amp2[:, None]),
        jnp.asarray(r), block=128, sub=32, interpret=True)
    ld = np.asarray(ld_t) + 0.5 * n * np.log(amp2)
    q = np.asarray(q_t) / amp2
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(q, q0, rtol=2e-3, atol=2e-3)


def test_fma_logdet_q_cpu_matches_marginal_form():
    """linalg.fma_logdet_q off-TPU ≡ assemble-then-chol_logdet_q."""
    rng = np.random.default_rng(9)
    n = 192
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    m0 = jnp.asarray(feats @ feats.T / 8 + 1e-3 * np.eye(n, dtype=np.float32))
    amp2 = jnp.asarray(1.3, jnp.float32)
    dadd = jnp.asarray(np.full(n, 0.2, np.float32))
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ld, q = linalg.fma_logdet_q(m0, amp2, dadd, r)
    k = amp2 * m0 + dadd * jnp.eye(n)
    ld0, q0 = linalg.chol_logdet_q(k, r)
    assert float(ld) == float(ld0) and float(q) == float(q0)


def test_chol_logdet_q_cpu_path_is_the_old_sequence():
    """Off-TPU the dispatch is bit-identical to chol→trisolve→logdet."""
    km, r = _case(1, 192, seed=3)
    ld, q = linalg.chol_logdet_q(km[0], r[0])
    chol = linalg.cholesky(km[0])
    w = linalg.tri_solve_1rhs(chol, r[0])
    assert float(ld) == float(linalg.logdet_from_chol(chol))
    assert float(q) == float(jnp.dot(w, w))


def test_chol_logdet_q_vmap_batches_whole_call():
    km, r = _case(4, 192, seed=11)
    ld, q = jax.vmap(linalg.chol_logdet_q)(km, r)
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(q, q0, rtol=1e-3, atol=1e-3)


def test_chol_logdet_q_vmap_broadcasts_unbatched_resid():
    km, r = _case(3, 192, seed=13)
    r0 = r[0]
    ld, q = jax.vmap(lambda k: linalg.chol_logdet_q(k, r0))(km)
    ld0, q0 = _reference(km, jnp.broadcast_to(r0, r.shape))
    np.testing.assert_allclose(ld, ld0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(q, q0, rtol=1e-3, atol=1e-3)
