"""Go/no-go microbenchmark for the joint-move band reduction.

VERDICT r4 next #1 prescribes measuring FIRST: the per-move band
reduction of M at the production shape [10, 5120, 5120] vs the ~10×54 ms
of fused O(n³) evaluations it would replace, plus the O(n·b²) banded
per-evaluation cost and its numerical parity against the fused kernel
and float64 golden math.

Run on the attached TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python bin/microbench_band.py
"""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    return float(np.asarray(x if not isinstance(x, tuple) else sum(
        jnp.sum(t) for t in x)).sum())


def med_time(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.core.kernels import matern52
    from spearmint_tpu.core.likelihood import (
        GPHypers, log_marginal, unit_cov_matrix,
    )
    from spearmint_tpu.ops import band

    K, N, D = 10, 5120, 2
    n_real = 5000
    rng = np.random.RandomState(0)
    x = np.zeros((N, D), np.float32)
    x[:n_real] = rng.rand(n_real, D)
    y = np.zeros(N, np.float32)
    y[:n_real] = np.sin(3 * x[:n_real, 0]) + 0.1 * rng.randn(n_real)
    mask = np.arange(N) < n_real
    xj, yj, mj = jnp.array(x), jnp.array(y), jnp.array(mask)
    ls = jnp.array(
        np.stack([rng.uniform(0.3, 1.2, D) for _ in range(K)]), jnp.float32)

    print(f"# devices: {jax.devices()}", flush=True)

    # realistic per-chain hypers
    means = jnp.array(rng.uniform(-0.2, 0.2, K), jnp.float32)
    amp2s = jnp.array(rng.uniform(0.3, 1.5, K), jnp.float32)
    noises = jnp.array(rng.uniform(5e-3, 5e-2, K), jnp.float32)

    # ---------------- fused-path single evaluation (the incumbent) ----
    @jax.jit
    def fused_eval(mean, amp2, noise, lsk):
        def one(m_, a_, nz_, l_):
            return log_marginal(xj, yj, mj, GPHypers(m_, a_, nz_, l_),
                                matern52)
        return jax.vmap(one)(mean, amp2, noise, lsk)

    lp_fused = fused_eval(means, amp2s, noises, ls)
    t_fused, raw = med_time(lambda: fused_eval(means, amp2s, noises, ls))
    print(f"fused_eval10_s {t_fused:.4f}  {raw}", flush=True)

    for blk in (128, 256):
        # ---------------- band reduction (once per joint move) --------
        @jax.jit
        def reduce10(lsk):
            def one(l_):
                m0 = unit_cov_matrix(xj, mj, l_, matern52)
                vecs = jnp.stack(
                    [jnp.where(mj, yj, 0.0), mj.astype(jnp.float32)], 1)
                return band.reduce_to_band(m0, vecs, blk)
            return jax.vmap(one)(lsk)

        t0 = time.perf_counter()
        dblk, sblk, vt = jax.block_until_ready(reduce10(ls))
        print(f"block={blk} reduce_compile+run_s {time.perf_counter()-t0:.1f}",
              flush=True)
        t_red, raw = med_time(lambda: reduce10(ls)[2])
        print(f"block={blk} reduce10_s {t_red:.4f}  {raw}", flush=True)

        # ---------------- banded evaluation (per slice eval) ----------
        @jax.jit
        def band_eval(mean, amp2, noise):
            def one(db, sb, vtk, m_, a_, nz_):
                dadd = jnp.where(mj, nz_, 1.0)
                resid = vtk[:, 0] - m_ * vtk[:, 1]
                ld, q = band.band_logdet_q(db, sb, a_, dadd, resid)
                return -ld - 0.5 * q
            return jax.vmap(one)(dblk, sblk, vt, mean, amp2, noise)

        lp_band = band_eval(means, amp2s, noises)
        t_ev, raw = med_time(lambda: band_eval(means, amp2s, noises))
        print(f"block={blk} band_eval10_s {t_ev:.4f}  {raw}", flush=True)

        # ---------------- parity ------------------------------------
        rel = np.abs(np.asarray(lp_band) / np.asarray(lp_fused) - 1.0)
        dabs = np.abs(np.asarray(lp_band) - np.asarray(lp_fused))
        print(f"block={blk} band_vs_fused max_rel {rel.max():.3e} "
              f"max_abs {dabs.max():.3e}", flush=True)

        # amortization: move cost = reduce + E evals (E ≈ 10 warmed, 16
        # un-burned) vs E fused evals
        for evals in (10, 16):
            old = evals * t_fused
            new = t_red + evals * t_ev + t_ev  # +1: banded lp0 at z=0
            print(f"block={blk} evals={evals} old={old:.3f}s "
                  f"new={new:.3f}s speedup={old/new:.2f}x", flush=True)

    # float64 golden parity at one chain (CPU, slow but definitive)
    import scipy.linalg as spla

    from spearmint_tpu.golden import numpy_ref as golden

    i = 0
    x64 = x[:n_real].astype(np.float64)
    cov = float(amp2s[i]) * golden.matern52(
        x64, x64, np.asarray(ls[i], np.float64))
    from spearmint_tpu.core.likelihood import _effective_jitter
    cov += float(amp2s[i]) * _effective_jitter(N) * np.eye(n_real)
    cov += float(noises[i]) * np.eye(n_real)
    chol = spla.cholesky(cov, lower=True)
    resid = y[:n_real].astype(np.float64) - float(means[i])
    w = spla.solve_triangular(chol, resid, lower=True)
    lp64 = -np.sum(np.log(np.diag(chol))) - 0.5 * w @ w
    print(f"chain0 lp64={lp64:.4f} fused={float(lp_fused[0]):.4f} "
          f"band={float(lp_band[0]):.4f} "
          f"d_fused={float(lp_fused[0])-lp64:+.3e} "
          f"d_band={float(lp_band[0])-lp64:+.3e}", flush=True)
