"""Fused GP logdet+quadratic kernel (ops/pallas_gp) — interpret-mode tests.

The production dispatch (linalg.chol_logdet_q) only routes to the Pallas
kernel on real TPU backends; these tests run the same kernel code in the
Pallas TPU interpreter at small shapes, so CI (CPU) exercises the full
manual-DMA factorization logic — in both eager-DMA mode (fast CI
default) and ``on_wait`` mode with the interpreter's race detector,
which models real DMA completion semantics and exercises the
multi-buffer ordering (ADVICE r3 #1).  TPU-scale correctness is a
committed profile artifact: every ``bin/profile_flagship.py`` run
records fused-vs-XLA max rel err at the production lowering
(docs/PROFILE_r4.md).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spearmint_tpu.core import linalg
from spearmint_tpu.ops.pallas_gp import logdet_q_pallas


@contextlib.contextmanager
def _dma_mode(mode, races=False):
    from spearmint_tpu.ops import pallas_gp

    old = (pallas_gp.INTERPRET_DMA, pallas_gp.INTERPRET_DETECT_RACES)
    pallas_gp.INTERPRET_DMA = mode
    pallas_gp.INTERPRET_DETECT_RACES = races
    try:
        yield
    finally:
        pallas_gp.INTERPRET_DMA, pallas_gp.INTERPRET_DETECT_RACES = old


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


def test_kernel_on_wait_dma_with_race_detection():
    """The triple-buffered load/store logic survives realistic DMA
    semantics: copies land only at wait(), and the interpreter's
    vector-clock race detector is armed (ADVICE r3 #1)."""
    km, r = _case(2, 384, 17, seed=21)
    with _dma_mode("on_wait", races=True):
        ld, q = logdet_q_pallas(km, r, block=128, sub=32, interpret=True)
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(q, q0, rtol=2e-3, atol=2e-3)


def test_factor_variant_emits_true_cholesky_and_solve():
    """factor_logdet_q_pallas: same scalars as logdet_q_pallas plus the
    factor L (valid on/below the diagonal) and w = L⁻¹r."""
    from spearmint_tpu.ops.pallas_gp import factor_logdet_q_pallas

    km, r = _case(3, 384, 25, seed=31)
    ld, q, lmat, w = factor_logdet_q_pallas(km, r, block=128, sub=32,
                                            interpret=True)
    chol0 = np.linalg.cholesky(np.asarray(km))
    w0 = np.stack([
        np.linalg.solve(np.tril(c), rr)
        for c, rr in zip(chol0, np.asarray(r))
    ])
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(q, q0, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.tril(np.asarray(lmat)), chol0,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(w, w0, rtol=2e-3, atol=2e-3)


def test_tri_inverse_pallas_matches_dense_inverse():
    """Blocked triangular inversion: X = L⁻¹ dense-complete (exact
    zeros above the diagonal), tolerant of garbage upper tiles in L."""
    from spearmint_tpu.ops.pallas_gp import (
        factor_logdet_q_pallas, tri_inverse_pallas,
    )
    import scipy.linalg as spla

    km, r = _case(2, 384, 11, seed=41)
    _, _, lmat, _ = factor_logdet_q_pallas(km, r, block=128, sub=32,
                                           interpret=True)
    with _dma_mode("on_wait", races=True):
        x = tri_inverse_pallas(lmat, block=128, sub=32, interpret=True)
    x = np.asarray(x)
    chol0 = np.linalg.cholesky(np.asarray(km))
    x0 = np.stack([
        spla.solve_triangular(c, np.eye(c.shape[0]), lower=True)
        for c in chol0
    ])
    np.testing.assert_allclose(x, x0, rtol=3e-4, atol=3e-4)
    assert float(np.max(np.abs(np.triu(x, 1)))) == 0.0


def _cache_case(k_batch, n, seed):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((k_batch, n, 8)).astype(np.float32)
    m0 = np.einsum("knd,kmd->knm", feats, feats) / 8
    m0 += 1e-3 * np.eye(n, dtype=np.float32)
    amp2 = rng.uniform(0.5, 2.0, k_batch).astype(np.float32)
    dadd = rng.uniform(0.1, 0.4, (k_batch, n)).astype(np.float32)
    r = rng.standard_normal((k_batch, n)).astype(np.float32)
    return (jnp.asarray(m0), jnp.asarray(amp2), jnp.asarray(dadd),
            jnp.asarray(r))


def test_cache_factor_cpu_path_is_the_old_cache_sequence():
    """Off-TPU linalg.cache_factor ≡ assemble → cholesky → cho_solve →
    tri_inverse bit-for-bit (golden-parity safety)."""
    m0, amp2, dadd, r = _cache_case(1, 192, seed=51)
    chol, linv, alpha = linalg.cache_factor(m0[0], amp2[0], dadd[0], r[0])
    k = amp2[0] * m0[0] + dadd[0] * jnp.eye(192)
    chol0 = linalg.cholesky(k)
    alpha0 = linalg.chol_solve(chol0, r[0])
    linv0 = linalg.tri_inverse(chol0)
    assert np.array_equal(np.asarray(chol), np.asarray(chol0))
    assert np.array_equal(np.asarray(alpha), np.asarray(alpha0))
    assert np.array_equal(np.asarray(linv), np.asarray(linv0))


def test_cache_factor_vmap_batches_whole_call():
    m0, amp2, dadd, r = _cache_case(4, 192, seed=61)
    chol, linv, alpha = jax.vmap(linalg.cache_factor)(m0, amp2, dadd, r)
    for i in range(4):
        k = amp2[i] * m0[i] + dadd[i] * jnp.eye(192)
        c0 = linalg.cholesky(k)
        np.testing.assert_allclose(np.asarray(chol[i]), np.asarray(c0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(alpha[i]), np.asarray(linalg.chol_solve(c0, r[i])),
            rtol=1e-3, atol=1e-4)


def test_shifted_factor_emits_rescalable_factor():
    """shifted_factor_logdet_q_pallas: √amp2·L̃ reproduces chol(K) and
    L̃⁻ᵀw̃/amp2 reproduces K⁻¹r (the linalg.cache_factor rescaling)."""
    from spearmint_tpu.ops.pallas_gp import shifted_factor_logdet_q_pallas
    import scipy.linalg as spla

    m0, amp2, dadd, r = _cache_case(2, 384, seed=71)
    ld, q, l_sh, w_sh = shifted_factor_logdet_q_pallas(
        m0, dadd / amp2[:, None], r, block=128, sub=32, interpret=True)
    for i in range(2):
        k = np.asarray(amp2[i] * m0[i] + dadd[i] * jnp.eye(384),
                       np.float64)
        c0 = np.linalg.cholesky(k)
        chol = np.tril(np.asarray(l_sh[i])) * np.sqrt(float(amp2[i]))
        np.testing.assert_allclose(chol, c0, rtol=2e-3, atol=2e-4)
        a0 = spla.cho_solve((c0, True), np.asarray(r[i], np.float64))
        a = spla.solve_triangular(
            np.tril(np.asarray(l_sh[i])).T, np.asarray(w_sh[i]),
            lower=False) / float(amp2[i])
        np.testing.assert_allclose(a, a0, rtol=2e-2, atol=2e-3)


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


def test_single_block_matrix_nb1():
    """n == block (nb=1): the panel/trailing loops run zero times and
    the kernel degenerates to the in-VMEM diagonal factorization — the
    shape hartmann-class problems (pad 512) hit in production."""
    from spearmint_tpu.ops.pallas_gp import (
        factor_logdet_q_pallas, tri_inverse_pallas,
    )
    import scipy.linalg as spla

    km, r = _case(3, 128, 9, seed=81)
    ld, q, lmat, w = factor_logdet_q_pallas(km, r, block=128, sub=32,
                                            interpret=True)
    ld0, q0 = _reference(km, r)
    np.testing.assert_allclose(ld, ld0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(q, q0, rtol=2e-3, atol=2e-3)
    x = np.asarray(tri_inverse_pallas(lmat, block=128, sub=32,
                                      interpret=True))
    chol0 = np.linalg.cholesky(np.asarray(km))
    x0 = np.stack([
        spla.solve_triangular(c, np.eye(128), lower=True) for c in chol0
    ])
    np.testing.assert_allclose(x, x0, rtol=3e-4, atol=3e-4)


def test_every_pad_bucket_factors_at_its_auto_block():
    """Property test over the `pad_bucket` ladder × `_pick_block`
    (VERDICT r4 next #8): every bucket ≥ 512 must (a) resolve to a
    supported panel width, and (b) factor correctly at that
    auto-selected block/sub in interpret mode.

    Numerics run on the ladder 512..2048, which covers every distinct
    block-selection class — buckets ≥ 2048 are all multiples of 512 and
    resolve identically (asserted below for the ladder up to 32768).
    """
    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.ops.pallas_gp import _pick_block, logdet_q_pallas

    # enumerate the bucket ladder by walking pad_bucket over n
    buckets, n = [], 512
    while n <= 32768:
        b = pad_bucket(n)
        if not buckets or b != buckets[-1]:
            buckets.append(b)
        n = b + 1
    assert buckets[:9] == [512, 640, 768, 896, 1024, 1280, 1536, 1792,
                           2048]
    seen_blocks = set()
    for b in buckets:
        blk = _pick_block(b)          # raises if some bucket is orphaned
        assert b % blk == 0
        seen_blocks.add(blk)
        if b >= 2048:
            assert blk == 512, (b, blk)
    assert seen_blocks == {128, 256, 512}

    rng = np.random.RandomState(0)
    for b in [x for x in buckets if x <= 2048]:
        a = rng.randn(b, 16).astype(np.float32)
        km = (a @ a.T + b * np.eye(b)).astype(np.float32)[None]
        r = rng.randn(1, b).astype(np.float32)
        # block=None → production auto selection (_pick_block + SUB clamp)
        ld, q = logdet_q_pallas(jnp.array(km), jnp.array(r),
                                interpret=True)
        chol = np.linalg.cholesky(km[0].astype(np.float64))
        ld_ref = np.sum(np.log(np.diag(chol)))
        w = np.linalg.solve(chol, r[0].astype(np.float64))
        np.testing.assert_allclose(float(ld[0]), ld_ref, rtol=1e-5,
                                   err_msg=f"bucket {b} logdet")
        np.testing.assert_allclose(float(q[0]), w @ w, rtol=1e-4,
                                   err_msg=f"bucket {b} quad")
