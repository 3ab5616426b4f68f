#!/usr/bin/env python
"""Phase-level wall-clock breakdown of the flagship suggestion (n=5k).

VERDICT.md round-1 weak #3: "Nobody has profiled where the 5.4 s actually
goes; do that before round 2 optimization."  This script times each phase
of engine/suggest.suggest_step as its own jitted program on the real
device, plus the micro-ops underneath (batched Cholesky, kernel assembly,
triangular solves, eigh) so optimization choices are grounded in numbers.

Writes docs/PROFILE_r3.md-ready lines to stdout.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from spearmint_tpu.core import linalg
from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import GPHypers, cov_matrix, log_marginal
from spearmint_tpu.engine.suggest import (
    SuggestConfig, init_chain_states, suggest_step,
)
from spearmint_tpu.mcmc.chains import MCMCConfig, sample_hypers
from spearmint_tpu.acquire import ei as ei_mod
from spearmint_tpu.acquire.optimize import minimize_lbfgs_b

N, D, CHAINS, CANDS = 5000, 2, 10, 2000
GRID_SUBSET, LBFGS_ITERS = 10, 20


def make_problem(n, d, cands, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1] if d > 1 else 1.0)
    y = y + 0.05 * rng.randn(n)
    cand = rng.rand(cands, d)
    return x, y - y.mean(), cand


def _force(out):
    """Force execution: reduce every leaf ON DEVICE, transfer one scalar.

    (block_until_ready can return early on the remote-TPU platform, and
    transferring a full [S, N, N] output over the tunnel dominates the
    measurement — a scalar that depends on the whole output does neither.)
    """
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
    return float(np.asarray(s))


def bench(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"# devices: {jax.devices()}")
    x, y, cand = make_problem(N, D, CANDS)
    pad = linalg.pad_bucket(N)
    xp = np.zeros((pad, D), np.float32); xp[:N] = x
    yp = np.zeros(pad, np.float32); yp[:N] = y
    mask = np.arange(pad) < N
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    hypers = init_chain_states(yj, mj, D, CHAINS)
    cj = jnp.array(cand, jnp.float32)
    cm = jnp.ones(CANDS, bool)
    pend = jnp.zeros((4, D), jnp.float32)
    pend_mask = jnp.zeros(4, bool)
    cfg = SuggestConfig(mcmc_iters=1, grid_subset=GRID_SUBSET,
                        lbfgs_iters=LBFGS_ITERS)
    key = jax.random.PRNGKey(0)
    kernel = cfg.kernel
    mcfg = cfg.mcmc

    # ---------------- full flagship -------------------------------------
    t_full = bench(
        lambda k: suggest_step(k, hypers, xj, yj, mj, pend, pend_mask,
                               cj, cm, cfg), key)
    print(f"full_suggest_s {t_full:.4f}")

    # ---------------- phase 1: MCMC sweep alone -------------------------
    @jax.jit
    def mcmc_only(k, h):
        ks = jax.random.split(k, CHAINS)
        return jax.vmap(lambda kk, hh: sample_hypers(kk, hh, xj, yj, mj,
                                                     mcfg))(ks, h)

    t_mcmc = bench(mcmc_only, key, hypers)
    print(f"phase_mcmc_sweep_s {t_mcmc:.4f}")

    # joint move only vs ls move only
    from spearmint_tpu.mcmc.slice import slice_sample
    from spearmint_tpu.mcmc import chains as chains_mod

    @jax.jit
    def joint_only(k, h):
        def one(kk, hh):
            vec0 = jnp.stack([hh.mean, hh.amp2, hh.noise])
            lp = lambda v: chains_mod._joint_logprob(v, xj, yj, mj, hh.ls,
                                                     mcfg)
            return slice_sample(kk, vec0, lp, compwise=False)
        return jax.vmap(one)(jax.random.split(k, CHAINS), h)

    # (Two retired joint-move variants were profiled here and removed:
    # r2's spectral cache — 22.7 s vs 1.13 s, batched eigh costs 21.35 s
    # at this shape, 340× the Cholesky (docs/PROFILE_r3.md) — and r2's
    # m0 covariance cache — 0.592 s vs 0.514 s uncached once
    # log_marginal itself used the in-kernel shifted assembly, because
    # the cached M outliving the move forces a ~1 GB XLA copy per
    # evaluation (docs/PROFILE_r4.md).)

    @jax.jit
    def ls_only(k, h):
        def one(kk, hh):
            lp = lambda l: chains_mod._ls_logprob(l, xj, yj, mj, hh, mcfg)
            return slice_sample(kk, hh.ls, lp, compwise=True)
        return jax.vmap(one)(jax.random.split(k, CHAINS), h)

    t_joint = bench(joint_only, key, hypers)
    t_ls = bench(ls_only, key, hypers)
    print(f"phase_joint_move_s {t_joint:.4f}")
    print(f"phase_ls_move_s {t_ls:.4f}")

    # ---------------- phase 2: posterior caches -------------------------
    flat = hypers  # [CHAINS] states stand in for S=chains*iters samples

    @jax.jit
    def caches_only(h):
        return jax.vmap(
            lambda hh: ei_mod.make_cache(xj, yj, mj, hh, kernel,
                                         with_inverse=True))(h)

    @jax.jit
    def caches_no_inv(h):
        return jax.vmap(
            lambda hh: ei_mod.make_cache(xj, yj, mj, hh, kernel,
                                         with_inverse=False))(h)

    t_cache = bench(caches_only, flat)
    t_cache_noinv = bench(caches_no_inv, flat)
    print(f"phase_caches_with_linv_s {t_cache:.4f}")
    print(f"phase_caches_no_linv_s {t_cache_noinv:.4f}")

    caches = caches_only(flat)

    # ---------------- phase 3: EI grid sweep ----------------------------
    @jax.jit
    def ei_sweep(c):
        return jax.vmap(
            lambda cc: ei_mod.ei_from_cache_chunked(cc, xj, mj, cj,
                                                    kernel))(c)

    t_ei = bench(ei_sweep, caches)
    print(f"phase_ei_grid_sweep_s {t_ei:.4f}")

    # ---------------- phase 4: L-BFGS refinement ------------------------
    ei_s = ei_sweep(caches)
    ei_mean = jnp.mean(ei_s, axis=0)

    @jax.jit
    def lbfgs_only(c, em):
        _, top_idx = jax.lax.top_k(em, GRID_SUBSET)
        starts = cj[top_idx]

        def neg_avg_ei(pt):
            eis = jax.vmap(
                lambda cc: ei_mod.ei_from_cache(cc, xj, mj, pt[None],
                                                kernel)[..., 0])(c)
            return -jnp.mean(eis)

        return minimize_lbfgs_b(neg_avg_ei, starts,
                                jnp.zeros(D, jnp.float32),
                                jnp.ones(D, jnp.float32),
                                iters=LBFGS_ITERS)

    t_lbfgs = bench(lbfgs_only, caches, ei_mean)
    print(f"phase_lbfgs_s {t_lbfgs:.4f}")

    print(f"phase_sum_s {t_mcmc + t_cache + t_ei + t_lbfgs:.4f}")

    # ---------------- micro-ops -----------------------------------------
    h1 = GPHypers(mean=jnp.float32(0.0), amp2=jnp.float32(1.0),
                  noise=jnp.float32(1e-3), ls=jnp.ones(D, jnp.float32))

    @jax.jit
    def assemble(ls_batch):
        return jax.vmap(
            lambda l: cov_matrix(xj, mj, 1.0, 1e-3, l, matern52))(ls_batch)

    ls_b = jnp.ones((CHAINS, D), jnp.float32)
    t_asm = bench(assemble, ls_b)
    print(f"micro_assemble10_s {t_asm:.4f}")

    ks = assemble(ls_b)

    chol_j = jax.jit(jnp.linalg.cholesky)
    t_chol = bench(chol_j, ks)
    flops = CHAINS * pad**3 / 3
    print(f"micro_chol10_s {t_chol:.4f}  ({flops/t_chol/1e12:.1f} TF/s)")

    chols = chol_j(ks)

    @jax.jit
    def solve1(c):
        b = jnp.broadcast_to(yj, (CHAINS, pad))
        return jax.vmap(linalg.chol_solve)(c, b)

    t_solve = bench(solve1, chols)
    print(f"micro_cholsolve10_1rhs_s {t_solve:.4f}")

    @jax.jit
    def logprob_eval(h):
        return jax.vmap(
            lambda hh: log_marginal(xj, yj, mj, hh, matern52))(h)

    t_lp = bench(logprob_eval, flat)
    print(f"micro_logprob10_s {t_lp:.4f}")

    @jax.jit
    def tri_inv(c):
        return jax.vmap(linalg.tri_inverse)(c)

    t_ti = bench(tri_inv, chols)
    print(f"micro_tri_inverse10_s {t_ti:.4f}")

    # (micro_eigh10 measured once in r3: 21.35 s — see PROFILE_r3.md;
    # dropped from the default run, it dominates profile wall-time.)

    # ---------------- fused-kernel parity at production scale -----------
    # VERDICT r3 missing #2: TPU-scale correctness of ops/pallas_gp must
    # be a committed artifact.  Every profile run measures the fused
    # kernel against the XLA sequence at the production lowering
    # (block=512, sub=128, Mosaic, Precision.HIGHEST) on the full
    # [CHAINS, pad, pad] flagship shape and prints max rel errs.
    from spearmint_tpu.ops import pallas_gp

    if pallas_gp.supported(pad):
        resid = jnp.where(mj, yj, 0.0)
        residb = jnp.broadcast_to(resid, (CHAINS, pad))

        @jax.jit
        def xla_ld_q(kb, rb):
            chols = jnp.linalg.cholesky(kb)
            w = jax.lax.linalg.triangular_solve(
                chols, rb[..., None], left_side=True, lower=True)[..., 0]
            ld = jnp.sum(jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)),
                         axis=-1)
            return ld, jnp.sum(w * w, axis=-1)

        ld_ref, q_ref = jax.device_get(xla_ld_q(ks, residb))

        def relerr(a, b):
            a = np.asarray(a); b = np.asarray(b)
            return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9)))

        # ("high" is not lowerable by Mosaic — only DEFAULT/HIGHEST
        # exist on this backend; DEFAULT's single-pass bf16 NaNs the
        # factorization at this conditioning, recorded for the data.)
        for prec in ("highest", "default"):
            t0 = time.perf_counter()
            ld_f, q_f = pallas_gp.logdet_q_pallas(ks, residb, prec=prec)
            ld_f, q_f = jax.device_get((ld_f, q_f))
            # timing: warm rep (first call above pays compile)
            t_f = bench(lambda: pallas_gp.logdet_q_pallas(ks, residb,
                                                          prec=prec))
            print(f"parity_fused_{prec}_relerr_logdet "
                  f"{relerr(ld_f, ld_ref):.3g}")
            print(f"parity_fused_{prec}_relerr_q {relerr(q_f, q_ref):.3g}")
            print(f"micro_fused10_{prec}_s {t_f:.4f}")

        # blocked triangular-inverse kernel (posterior-cache path)
        chols_b = jax.jit(jnp.linalg.cholesky)(ks)
        t_tip = bench(lambda: pallas_gp.tri_inverse_pallas(chols_b))
        print(f"micro_tri_inverse_pallas10_s {t_tip:.4f}")
        x_p = np.asarray(pallas_gp.tri_inverse_pallas(chols_b)[0])
        x_ref = np.asarray(jax.jit(
            lambda c: jax.vmap(linalg.tri_inverse)(c))(chols_b)[0])
        print(f"parity_tri_inverse_relerr "
              f"{np.max(np.abs(x_p - x_ref)) / np.max(np.abs(x_ref)):.3g}")

        # shifted (joint-move) form parity: K = amp2·M + diag(dadd)
        from spearmint_tpu.core.likelihood import unit_cov_matrix

        m0 = jax.vmap(lambda l: unit_cov_matrix(xj, mj, l, matern52))(ls_b)
        amp2 = jnp.full((CHAINS,), 1.7, jnp.float32)
        dadd = jnp.where(mj, 1e-3, 1.0)[None].repeat(CHAINS, 0)
        kb2 = amp2[:, None, None] * m0 + jax.vmap(jnp.diag)(dadd)
        ld_ref2, q_ref2 = jax.device_get(xla_ld_q(kb2, residb))
        ld_s, q_s = pallas_gp.shifted_logdet_q_pallas(
            m0, dadd / amp2[:, None], residb)
        ld_s = np.asarray(ld_s) + 0.5 * pad * np.log(np.asarray(amp2))
        q_s = np.asarray(q_s) / np.asarray(amp2)
        print(f"parity_shifted_relerr_logdet {relerr(ld_s, ld_ref2):.3g}")
        print(f"parity_shifted_relerr_q {relerr(q_s, q_ref2):.3g}")
    else:
        print("# fused-kernel parity skipped (backend/shape unsupported)")


if __name__ == "__main__":
    main()
