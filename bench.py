"""Headline benchmark: BO suggestion latency at n=5k observations.

BASELINE.json metric: "BO suggestion latency at n=5k obs; slice-sampling
steps/s; EI evals/s/chip"; target ≥50× vs reference CPU Spearmint.

One suggestion (reference semantics, SURVEY.md §3.2) = 10 hyperparameter
samples (each a full slice-sampling sweep whose log-marginal costs an
O(n³) Cholesky per evaluation) + 10 EI sweeps over the candidate set +
L-BFGS refinement.  TPU side: 10 vmapped chains × 1 sweep in one jitted
program.  CPU baseline: the independent NumPy/SciPy golden re-derivation
(spearmint_tpu/golden) with the reference's sequential execution model,
calibrated as
    (likelihood evals per sweep, counted at small n — geometry-, not
     n-dependent) × (measured per-eval cost at full n) × 10 sweeps
  + measured EI-sweep cost × 10
(the baseline gets the L-BFGS phase for free — conservative in the
baseline's favor).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu latency s>, "unit": "s", "vs_baseline": <speedup x>}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_problem(n, d, cands, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1] if d > 1 else 1.0)
    y = y + 0.05 * rng.randn(n)
    cand = rng.rand(cands, d)
    return x, y - y.mean(), cand


def time_tpu(n, d, chains, cands, reps, lbfgs_iters=20, grid_subset=10,
             n_pending=0, n_fantasies=10, kernel_name="Matern52",
             explicit_inverse=True):
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states, suggest_step,
    )

    x, y, cand = make_problem(n, d, cands)
    pad = pad_bucket(n)
    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = np.arange(pad) < n
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    hypers = init_chain_states(yj, mj, d, chains)
    p_pad = max(4, n_pending)
    rngp = np.random.RandomState(7)
    pend = jnp.array(rngp.rand(p_pad, d), jnp.float32)
    pend_mask = jnp.array(np.arange(p_pad) < n_pending)
    cj = jnp.array(cand, jnp.float32)
    cm = jnp.ones(cands, bool)
    cfg = SuggestConfig(mcmc_iters=1, grid_subset=grid_subset,
                        lbfgs_iters=lbfgs_iters,
                        has_pending=n_pending > 0, n_fantasies=n_fantasies,
                        kernel_name=kernel_name,
                        explicit_inverse=explicit_inverse)

    key = jax.random.PRNGKey(0)

    def run(k, h):
        return suggest_step(k, h, xj, yj, mj, pend, pend_mask, cj, cm, cfg)

    def force(res):
        # On the experimental remote-TPU platform block_until_ready can
        # return before execution finishes; a host transfer of a value
        # that depends on the whole program cannot.
        return float(np.asarray(res.ei).sum()) + float(
            np.asarray(res.hypers.ls).sum())

    # warmup/compile
    res = run(key, hypers)
    force(res)
    hypers = res.hypers

    times = []
    for i in range(reps):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        res = run(k, hypers)
        force(res)
        times.append(time.perf_counter() - t0)
        hypers = res.hypers
    return float(np.median(times))


def _count_eval_calls(n_small, d, sweeps=3, seed=0):
    """Likelihood evals per hyper-sweep, counted on a small instance."""
    from spearmint_tpu.golden import numpy_ref as g

    x, y, _ = make_problem(n_small, d, 16, seed)
    gp = g.GoldenGP(d, y, seed=seed)
    counter = {"n": 0}
    orig = g.log_marginal

    def counting(*a, **k):
        counter["n"] += 1
        return orig(*a, **k)

    g.log_marginal = counting
    try:
        for _ in range(sweeps):
            gp.sample_hypers(x, y)
    finally:
        g.log_marginal = orig
    return counter["n"] / sweeps


def time_baseline(n, d, cands, mcmc_iters=10):
    """Calibrated reference-CPU suggestion latency at full n."""
    import scipy.linalg as spla

    from spearmint_tpu.golden import numpy_ref as g

    evals_per_sweep = _count_eval_calls(min(n, 400), d)

    x, y, cand = make_problem(n, d, cands)
    # per-eval cost at full n: the exact computation the slice sampler
    # does per logprob call (cov assembly + cholesky + solve)
    ls = np.ones(d)
    eval_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cov = 1.0 * (g.matern52(x, x, ls) + 1e-6 * np.eye(n)) + 1e-3 * np.eye(n)
        chol = spla.cholesky(cov, lower=True)
        spla.cho_solve((chol, True), y)
        eval_times.append(time.perf_counter() - t0)
    # min over reps: least load-sensitive estimate (favors the baseline)
    per_eval = min(eval_times)

    ei_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        g.compute_ei(x, y, cand, mean=0.0, amp2=1.0, noise=1e-3, ls=ls)
        ei_times.append(time.perf_counter() - t0)
    ei_time = min(ei_times)

    return mcmc_iters * (evals_per_sweep * per_eval + ei_time), {
        "evals_per_sweep": evals_per_sweep,
        "per_eval_s": per_eval,
        "ei_sweep_s": ei_time,
    }


# The five BASELINE.json benchmark configs (single-chip scalings of the
# pod-scale targets; chains shard over a mesh for the full versions).
PRESETS = {
    # Branin parity: small-n regime, the canonical smoke test
    "branin": dict(n=30, d=2, chains=10, cands=2000),
    # Hartmann-6: 20 chains, 2k EI candidates
    "hartmann": dict(n=500, d=6, chains=20, cands=2048),
    # async: 64 pending fantasized (F=100 draws/sample)
    "async": dict(n=1000, d=2, chains=10, cands=2048, n_pending=64,
                  n_fantasies=100),
    # large-n: 10k observations (single-chip slice of the pod config);
    # no materialized L^-1 — the extra [S, 12288, 12288] buffer doesn't
    # pay at this memory pressure
    "large": dict(n=10000, d=2, chains=4, cands=8192,
                  explicit_inverse=False),
    # pallas kernel path
    "pallas": dict(n=5000, d=2, chains=10, cands=2048,
                   kernel_name="Matern52Pallas"),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--d", type=int, default=2)
    p.add_argument("--chains", type=int, default=10)
    p.add_argument("--cands", type=int, default=2000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    p.add_argument("--quick", action="store_true",
                   help="small shapes for smoke testing")
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--no-explicit-inverse", action="store_true",
                   help="triangular solves instead of materialized L^-1")
    args = p.parse_args(argv)

    extra = {}
    if args.preset:
        cfg = dict(PRESETS[args.preset])
        args.n = cfg.pop("n"); args.d = cfg.pop("d")
        args.chains = cfg.pop("chains"); args.cands = cfg.pop("cands")
        extra = cfg
    if args.quick:
        args.n, args.cands, args.reps = 256, 256, 2

    if args.no_explicit_inverse:
        extra["explicit_inverse"] = False
    tpu_latency = time_tpu(args.n, args.d, args.chains, args.cands,
                           args.reps, **extra)

    if args.skip_baseline:
        baseline, detail = float("nan"), {}
        vs = float("nan")
    else:
        baseline, detail = time_baseline(args.n, args.d, args.cands)
        vs = baseline / tpu_latency

    name = args.preset or f"n{args.n}_chains{args.chains}_cands{args.cands}"
    print(json.dumps({
        "metric": f"suggestion_latency_{name}",
        "value": round(tpu_latency, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }), flush=True)
    # secondary BASELINE metrics (slice-sampling sweeps/s, EI evals/s/chip)
    sweeps_per_s = args.chains / tpu_latency
    ei_evals_per_s = args.chains * args.cands / tpu_latency
    print(f"# baseline={baseline:.2f}s sweeps/s={sweeps_per_s:.1f} "
          f"ei_evals/s={ei_evals_per_s:.3g} detail={detail}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
