"""Band reduction for the joint slice move (ops/band.py).

The per-move O(n³)→O(n·b²) trick (VERDICT r4 next #1): reduce the fixed
unit covariance M to block-tridiagonal form once, then every joint-move
slice evaluation of K = amp2·M + diag(dadd) is a banded factorization.
Correctness hinges on (a) the compact-WY panel algebra and (b) padded
coordinates staying exactly inert through the reduction (so diag(dadd)
survives the congruence) — both tested here against dense references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import GPHypers, log_marginal, unit_cov_matrix
from spearmint_tpu.ops import band


def _problem(n_real, npad, d=2, seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros((npad, d), np.float32)
    x[:n_real] = rng.rand(n_real, d)
    y = np.zeros(npad, np.float32)
    y[:n_real] = np.sin(3 * x[:n_real, 0]) + 0.1 * rng.randn(n_real)
    mask = np.arange(npad) < n_real
    return jnp.array(x), jnp.array(y), jnp.array(mask)


def test_panel_wy_is_a_valid_block_reflector(rng):
    """Q = I − VTVᵀ from _panel_wy must be orthogonal and QᵀP = [R; 0]."""
    m, b = 24, 8
    p = jnp.array(rng.randn(m, b), jnp.float32)
    r, v, t = band._panel_wy(p)
    q = jnp.eye(m) - v @ t @ v.T
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(m), atol=2e-5)
    qtp = np.asarray(q.T @ p)
    np.testing.assert_allclose(qtp[:b], np.asarray(r), atol=2e-5)
    np.testing.assert_allclose(qtp[b:], 0.0, atol=2e-5)
    assert np.allclose(np.asarray(jnp.tril(r, -1)), 0.0)


def test_panel_wy_zero_tau_columns_are_identity_reflectors(rng):
    """Zero panel columns (padded observations) must contribute H = I:
    their T row/col is exactly zero and Q stays orthogonal."""
    m, b = 20, 6
    p = np.asarray(rng.randn(m, b), np.float32)
    p[:, 2] = 0.0          # an interior zero column
    p[:, 5] = 0.0          # and a trailing one
    r, v, t = band._panel_wy(jnp.array(p))
    tnp = np.asarray(t)
    assert np.all(tnp[2, :] == 0) and np.all(tnp[:, 2] == 0)
    assert np.all(tnp[5, :] == 0) and np.all(tnp[:, 5] == 0)
    q = jnp.eye(m) - v @ t @ v.T
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(m), atol=2e-5)
    qtp = np.asarray(q.T @ jnp.array(p))
    np.testing.assert_allclose(qtp[b:], 0.0, atol=2e-5)


def test_householder_qr_scan_matches_geqrf(rng):
    """The pure-JAX fallback must reproduce geqrf's (V, τ) reflectors
    up to the same Q (sign conventions may differ per column, so
    compare the assembled orthogonal factor against jnp QR of P)."""
    m, b = 16, 5
    p = jnp.array(rng.randn(m, b), jnp.float32)
    vt, taus = band._householder_qr_scan(p)
    r = np.asarray(jnp.triu(vt[:b]))
    # reconstruct Q by applying reflectors to identity sequentially
    q = np.eye(m, dtype=np.float64)
    vtn = np.asarray(vt, np.float64)
    for j in range(b):
        v = np.zeros(m)
        v[j] = 1.0
        v[j + 1:] = vtn[j + 1:, j]
        q = q @ (np.eye(m) - float(taus[j]) * np.outer(v, v))
    np.testing.assert_allclose(q.T @ np.asarray(p, np.float64),
                               np.vstack([r, np.zeros((m - b, b))]),
                               atol=3e-5)


@pytest.mark.parametrize("n_real,npad,blk", [
    (12, 16, 4),      # tiny, pad within last block
    (40, 64, 8),      # three empty blocks at the tail (zero-τ panels)
    (200, 256, 32),
    (230, 256, 128),  # nb=2: no panels at all (pure remnant path)
    (128, 128, 128),  # nb=1: single block
])
def test_band_marginal_matches_dense(n_real, npad, blk):
    """band_marginal_factory ≡ log_marginal over realistic hypers —
    including pads that cross panel boundaries (zero-τ columns) and
    the nb ≤ 2 remnant-only degenerate shapes."""
    x, y, mask = _problem(n_real, npad)
    ls = jnp.array([0.5, 0.9], jnp.float32)
    marg = band.band_marginal_factory(x, y, mask, ls, matern52, block=blk)
    for mean, amp2, noise in [(0.1, 0.8, 1e-2), (-0.2, 0.3, 0.1),
                              (0.0, 1.5, 1e-3)]:
        got = float(marg(jnp.float32(mean), jnp.float32(amp2),
                         jnp.float32(noise)))
        want = float(log_marginal(
            x, y, mask,
            GPHypers(jnp.float32(mean), jnp.float32(amp2),
                     jnp.float32(noise), ls), matern52))
        assert got == pytest.approx(want, rel=2e-3, abs=2e-2), (
            n_real, npad, blk, mean, amp2, noise)


def test_reduction_is_an_exact_congruence(rng):
    """QᵀMQ must reproduce M's spectrum-level quantities: check
    logdet(amp2·T + dadd) against the dense matrix via the banded
    blocks directly (no marginal wrapper), and that padded rows stay
    EXACTLY inert (L diag 1 → zero logdet contribution)."""
    x, y, mask = _problem(40, 64)
    ls = jnp.array([0.6, 0.8], jnp.float32)
    m0 = unit_cov_matrix(x, mask, ls, matern52)
    vecs = jnp.stack([jnp.where(mask, y, 0.0),
                      mask.astype(jnp.float32)], 1)
    db, sb, vt = band.reduce_to_band(m0, vecs, 8)
    amp2, noise = jnp.float32(0.7), jnp.float32(1e-2)
    dadd = jnp.where(mask, noise, 1.0)
    resid = vt[:, 0] - 0.05 * vt[:, 1]
    ld, q = band.band_logdet_q(db, sb, amp2, dadd, resid)
    # dense reference of the SAME quantity
    kd = amp2 * m0 + jnp.diag(dadd)
    chol = np.linalg.cholesky(np.asarray(kd, np.float64))
    r_dense = np.asarray(jnp.where(mask, y, 0.0), np.float64) - 0.05 * \
        np.asarray(mask, np.float64)
    w = np.linalg.solve(chol, r_dense)
    np.testing.assert_allclose(float(ld), np.log(np.diag(chol)).sum(),
                               rtol=1e-4)
    np.testing.assert_allclose(float(q), w @ w, rtol=1e-3)
    # padded tail of the transformed vectors is exactly zero
    np.testing.assert_array_equal(np.asarray(vt[40:]), 0.0)


def test_band_marginal_vmaps_over_chains():
    x, y, mask = _problem(50, 64)
    ls = jnp.array(np.random.RandomState(3).uniform(0.4, 1.1, (4, 2)),
                   jnp.float32)
    means = jnp.array([0.0, 0.1, -0.1, 0.2], jnp.float32)
    amp2s = jnp.array([0.5, 1.0, 0.8, 1.2], jnp.float32)
    noises = jnp.array([1e-2, 5e-3, 2e-2, 1e-2], jnp.float32)

    def one(l_, m_, a_, n_):
        marg = band.band_marginal_factory(x, y, mask, l_, matern52,
                                          block=8)
        return marg(m_, a_, n_)

    got = jax.vmap(one)(ls, means, amp2s, noises)
    for i in range(4):
        want = one(ls[i], means[i], amp2s[i], noises[i])
        np.testing.assert_allclose(float(got[i]), float(want), rtol=1e-4)


@pytest.mark.parametrize("n_real,npad,blk", [
    (12, 16, 4),      # nb=4 (already a power of two)
    (40, 64, 8),      # nb=8
    (300, 320, 32),   # nb=10 → padded to 16 with inert blocks
    (230, 256, 128),  # nb=2 (single CR level)
    (128, 128, 128),  # nb=1 → padded to 2
])
def test_cr_marginal_matches_scan_and_dense(n_real, npad, blk):
    """The cyclic-reduction evaluator (the production band-mode path)
    must agree with both the sequential-scan evaluator and the dense
    marginal, across power-of-two and padded block counts."""
    x, y, mask = _problem(n_real, npad)
    ls = jnp.array([0.5, 0.9], jnp.float32)
    cr = band.band_marginal_factory(x, y, mask, ls, matern52, block=blk,
                                    use_cr=True)
    sc = band.band_marginal_factory(x, y, mask, ls, matern52, block=blk,
                                    use_cr=False)
    # No 1e-3-noise corner here: at small pads (no _effective_jitter
    # floor, cond ~1e6) the CR explicit-inverse algebra drifts
    # O(cond·ε) ~ 0.5 nats — which is why the factory auto-gates CR to
    # pads ≥ 2048, where the jitter floor caps the drift at the fused
    # kernel's own ~1e-4 level (measured: docs/PROFILE_r5.md).
    for mean, amp2, noise in [(0.1, 0.8, 1e-2), (-0.2, 0.3, 0.1),
                              (0.0, 1.5, 3e-2)]:
        a = jnp.float32
        got = float(cr(a(mean), a(amp2), a(noise)))
        scan_v = float(sc(a(mean), a(amp2), a(noise)))
        dense = float(log_marginal(
            x, y, mask, GPHypers(a(mean), a(amp2), a(noise), ls),
            matern52))
        assert got == pytest.approx(scan_v, rel=2e-3, abs=2e-2)
        assert got == pytest.approx(dense, rel=2e-3, abs=2e-2)


def test_chol_small_and_tri_inv_small(rng):
    """The value-level Cholesky + nilpotent-squaring inverse used by
    cyclic reduction, against NumPy — batched over a flattened
    (chains × blocks) axis exactly as the CR levels use them."""
    g, b = 7, 16
    a = rng.randn(g, b, 24).astype(np.float32)
    spd = a @ np.swapaxes(a, -1, -2) + 24 * np.eye(b, dtype=np.float32)
    lmat, d = band._chol_small(jnp.array(spd))
    linv = band._tri_inv_small(lmat, d)
    for i in range(g):
        ref = np.linalg.cholesky(spd[i].astype(np.float64))
        got_l = np.tril(np.asarray(lmat[i], np.float64))
        np.testing.assert_allclose(got_l, ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(d[i]), np.diag(ref),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(linv[i]) @ ref, np.eye(b), atol=5e-4)


def test_cr_pallas_kernel_matches_xla_recursion(rng):
    """The Mosaic cyclic-reduction kernel (interpret mode on CPU) must
    reproduce the XLA _cr_body bit-for-bit-ish, including a dense
    cross-check of chain 0."""
    K, m, b = 3, 8, 16
    base = rng.randn(K, m, b, 2 * b).astype(np.float32)
    d = np.matmul(base, np.swapaxes(base, -1, -2)) + 10 * np.eye(
        b, dtype=np.float32)
    s = (0.3 * rng.randn(K, m, b, b)).astype(np.float32)
    s[:, -1] = 0.0
    amp2 = rng.uniform(0.5, 1.5, K).astype(np.float32)
    dadd = rng.uniform(0.01, 0.1, (K, m * b)).astype(np.float32)
    r = rng.randn(K, m * b).astype(np.float32)
    a, bb = band._cr_assemble(jnp.array(d), jnp.array(s),
                              jnp.array(amp2), jnp.array(dadd),
                              jnp.array(r))
    ld_k, q_k = band.cr_logdet_q_pallas(a, bb, jnp.array(r),
                                        interpret=True)
    ld_x, q_x = band._cr_body(a, bb, jnp.array(r).reshape(K, m, b), 1,
                              band._chol_small)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_x),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_x),
                               rtol=1e-4)
    # dense reference, chain 0
    kd = np.zeros((m * b, m * b))
    for i in range(m):
        kd[i*b:(i+1)*b, i*b:(i+1)*b] = np.asarray(a[0, i])
        if i + 1 < m:
            kd[(i+1)*b:(i+2)*b, i*b:(i+1)*b] = np.asarray(bb[0, i])
            kd[i*b:(i+1)*b, (i+1)*b:(i+2)*b] = np.asarray(bb[0, i]).T
    chol = np.linalg.cholesky(kd)
    w = np.linalg.solve(chol, np.asarray(r[0], np.float64))
    np.testing.assert_allclose(float(ld_k[0]),
                               np.log(np.diag(chol)).sum(), rtol=1e-5)
    np.testing.assert_allclose(float(q_k[0]), w @ w, rtol=1e-4)


def test_band_mode_sampler_matches_distribution():
    """Sampler-level check: hyperparameter chains driven with the
    band-mode joint move must land on the same posterior as the fused
    path — same data, different keys, posterior moments within MC
    error.  (Marginal-value parity is tested above; this closes the
    loop on the lp0 re-seeding discipline inside sample_hypers_lp.)"""
    from spearmint_tpu.mcmc.chains import MCMCConfig, sample_hypers_lp

    x, y, mask = _problem(100, 128)
    chains, sweeps = 4, 30

    def run(band, seed):
        cfg = MCMCConfig(band_joint=band, band_block=16)
        from spearmint_tpu.mcmc.chains import init_hypers

        h = init_hypers(y, mask, 2)
        h = jax.tree.map(lambda a: jnp.broadcast_to(a, (chains,) + a.shape),
                         h)

        def chain(k, h0):
            ks = jax.random.split(k, sweeps)

            def body(carry, kk):
                hh, lp = carry
                h2, lp2 = sample_hypers_lp(kk, hh, lp, x, y, mask, cfg)
                return (h2, lp2), h2

            from spearmint_tpu.mcmc.chains import marginal_at

            lp0 = marginal_at(x, y, mask, h0, cfg)
            (_, _), samples = jax.lax.scan(body, (h0, lp0), ks)
            return samples

        keys = jax.random.split(jax.random.PRNGKey(seed), chains)
        return jax.vmap(chain)(keys, h)

    sb = run(True, 0)
    sf = run(False, 1)
    # second half of each chain (past mixing), pooled
    for name in ("amp2", "noise", "mean"):
        a = np.asarray(getattr(sb, name))[:, sweeps // 2:].ravel()
        b = np.asarray(getattr(sf, name))[:, sweeps // 2:].ravel()
        la, lb = np.log(np.abs(a) + 1e-6), np.log(np.abs(b) + 1e-6)
        se = np.sqrt(la.var() / 8 + lb.var() / 8)  # ~8 effective samples
        assert abs(la.mean() - lb.mean()) < 4 * se + 0.35, (
            name, la.mean(), lb.mean(), se)
