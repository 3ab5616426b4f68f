#!/usr/bin/env python
"""Measure slice-sampler eval-count distributions and the lockstep tax.

VERDICT r3 next #3: set MAX_SHRINK / max_steps_out from measured
quantiles of real traces, and quantify the lockstep overhead (a
vmapped move runs max-over-chains iterations per phase machine, so the
batch pays the slowest chain's evaluation count).

Runs the flagship MCMC configuration (n=5000 obs, 10 chains) for a
configurable number of sweeps with ``slice_sample(..., with_counts=
True)`` and prints, per move type (joint / per-ls-component):

  * eval-count distribution (mean / p50 / p90 / p99 / max) — each
    move's total logprob evals = lo + up + sh + 2 when stepped out on a
    finite slice (the two bracket-leaving evaluations), sh otherwise;
  * measured budget headroom vs MAX_STEPS_OUT / MAX_SHRINK;
  * the lockstep tax: Σ_moves max-over-chains(evals) vs the mean
    per-chain Σ evals (what a sequential chain would pay).

Usage: PYTHONPATH=... python bin/profile_slice_counts.py [sweeps] [n]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from spearmint_tpu.core import linalg
from spearmint_tpu.engine.suggest import init_chain_states
from spearmint_tpu.mcmc import chains as chains_mod
from spearmint_tpu.mcmc.chains import MCMCConfig, marginal_at
from spearmint_tpu.mcmc.slice import MAX_SHRINK, MAX_STEPS_OUT, slice_sample

N = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
SWEEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
D, CHAINS = 2, 10


def make_problem(n, d, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1]) + 0.05 * rng.randn(n)
    return x, y - y.mean()


def main():
    print(f"# devices: {jax.devices()}  n={N} chains={CHAINS} "
          f"sweeps={SWEEPS}")
    x, y = make_problem(N, D)
    pad = linalg.pad_bucket(N)
    xp = np.zeros((pad, D), np.float32); xp[:N] = x
    yp = np.zeros(pad, np.float32); yp[:N] = y
    mask = np.arange(pad) < N
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    hypers = init_chain_states(yj, mj, D, CHAINS)
    mcfg = MCMCConfig()

    @jax.jit
    def sweep(key, h, lp):
        """One instrumented hyper sweep (mirrors chains.sample_hypers_lp
        with with_counts threaded through)."""
        def one(k, hh, lp0):
            k_joint, k_ls = jax.random.split(k)
            vec0 = jnp.stack([hh.mean, hh.amp2, hh.noise])

            def joint_lp(vec):
                return chains_mod._joint_logprob(vec, xj, yj, mj, hh.ls,
                                                 mcfg)

            lp0_joint = lp0 + chains_mod._joint_prior_terms(
                hh.amp2, hh.noise, mcfg)
            vec, lp_joint, c_joint = slice_sample(
                k_joint, vec0, joint_lp, compwise=False, lp0=lp0_joint,
                with_lp=True, with_counts=True)
            mean, amp2, noise = vec[0], vec[1], vec[2]
            mid = chains_mod.GPHypers(mean, amp2, noise, hh.ls)

            def ls_lp(ls):
                return chains_mod._ls_logprob(ls, xj, yj, mj, mid, mcfg)

            lp0_ls = lp_joint - chains_mod._joint_prior_terms(amp2, noise,
                                                              mcfg)
            ls, lp_ls, c_ls = slice_sample(
                k_ls, hh.ls, ls_lp, compwise=True, lp0=lp0_ls,
                with_lp=True, with_counts=True)
            return (chains_mod.GPHypers(mean, amp2, noise, ls), lp_ls,
                    c_joint, c_ls)

        ks = jax.random.split(key, CHAINS)
        return jax.vmap(one)(ks, h, lp)

    @jax.jit
    def seed_lp(h):
        return jax.vmap(lambda hh: marginal_at(xj, yj, mj, hh, mcfg))(h)

    key = jax.random.PRNGKey(0)
    lp = seed_lp(hypers)
    joint_counts = []   # [sweeps, chains, 3]
    ls_counts = []      # [sweeps, chains, D, 3]
    for _ in range(SWEEPS):
        key, k = jax.random.split(key)
        hypers, lp, cj, cl = sweep(k, hypers, lp)
        joint_counts.append(np.asarray(cj))
        ls_counts.append(np.asarray(cl))
    cj = np.stack(joint_counts)            # [S, K, 3]
    cl = np.stack(ls_counts)               # [S, K, D, 3]

    def evals_of(c):
        # lo + up + sh + 2 bracket-leaving evals (expansion always ran
        # here: slices are finite after the first accepted state)
        return c[..., 0] + c[..., 1] + c[..., 2] + 2

    ej = evals_of(cj)                      # [S, K]
    el = evals_of(cl)                      # [S, K, D]

    def stats(name, e, budget_sh, sh):
        q = np.percentile
        print(f"{name}: evals mean {e.mean():.2f} p50 {q(e, 50):.0f} "
              f"p90 {q(e, 90):.0f} p99 {q(e, 99):.0f} max {e.max():.0f}")
        print(f"{name}: shrink evals mean {sh.mean():.2f} "
              f"p99 {q(sh, 99):.0f} p99.9 {q(sh, 99.9):.1f} "
              f"max {sh.max():.0f} (budget {budget_sh})")

    stats("joint", ej, MAX_SHRINK, cj[..., 2])
    for d in range(D):
        stats(f"ls[{d}]", el[..., d], MAX_SHRINK, cl[..., d, 2])
    so = np.concatenate([cj[..., :2].ravel(), cl[..., :2].ravel()])
    print(f"step_out expansions: mean {so.mean():.2f} "
          f"p99 {np.percentile(so, 99):.0f} max {so.max():.0f} "
          f"(budget {MAX_STEPS_OUT})")

    # lockstep tax: batched move runs max-over-chains evals per move
    per_sweep_lockstep = (ej.max(axis=1)
                          + sum(el[..., d].max(axis=1) for d in range(D)))
    per_sweep_seq = (ej + el.sum(axis=2)).mean(axis=1)
    print(f"lockstep evals/sweep: mean {per_sweep_lockstep.mean():.1f} "
          f"(sequential-chain mean {per_sweep_seq.mean():.1f} -> tax "
          f"{per_sweep_lockstep.mean() / per_sweep_seq.mean():.2f}x)")

    # chain-chunk what-if: 2 groups of 5 pay sum of two maxes but HALF
    # the per-eval batch cost only if per-eval scales linearly in K —
    # it does not (fixed diag-phase latency); report the eval counts so
    # the per-eval scaling measurement (bench) can complete the answer.
    g = CHAINS // 2
    lock2 = (ej[:, :g].max(axis=1) + ej[:, g:].max(axis=1)
             + sum(el[:, :g, d].max(axis=1) + el[:, g:, d].max(axis=1)
                   for d in range(D)))
    print(f"2x5-chunk evals/sweep: mean {lock2.mean():.1f} "
          f"(vs 1x10 {per_sweep_lockstep.mean():.1f}; chunked runs "
          f"each group sequentially at half batch width)")


if __name__ == "__main__":
    main()
