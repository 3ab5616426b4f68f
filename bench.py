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
             explicit_inverse=True, chain_chunk=0, obs_shard=False,
             band_joint="auto"):
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states, suggest_step,
    )

    x, y, cand = make_problem(n, d, cands)
    pad = pad_bucket(n)
    if band_joint == "auto":
        # r5 measured every implementable band-mode evaluator at
        # break-even or worse (docs/PROFILE_r5.md) — default off, flag
        # kept for experiments (mirrors the chooser's band_joint_min=0)
        band_joint = False
    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = np.arange(pad) < n
    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    hypers = init_chain_states(yj, mj, d, chains)
    from spearmint_tpu.core.linalg import pend_pad

    # chooser-parity pending pad (fused-eligibility rule lives in
    # linalg.pend_pad); the benches historically used the raw pending
    # count as the floor, preserved via minimum=
    p_pad = (pend_pad(pad, n_pending) if n_pending > 0
             else max(4, n_pending))
    rngp = np.random.RandomState(7)
    pend = jnp.array(rngp.rand(p_pad, d), jnp.float32)
    pend_mask = jnp.array(np.arange(p_pad) < n_pending)
    cj = jnp.array(cand, jnp.float32)
    cm = jnp.ones(cands, bool)
    cfg = SuggestConfig(mcmc_iters=1, grid_subset=grid_subset,
                        lbfgs_iters=lbfgs_iters,
                        has_pending=n_pending > 0, n_fantasies=n_fantasies,
                        kernel_name=kernel_name,
                        explicit_inverse=explicit_inverse,
                        chain_chunk=chain_chunk,
                        band_joint=bool(band_joint))

    key = jax.random.PRNGKey(0)

    if obs_shard == "auto":
        # Production gate (GPEIOptChooser.next use_obs): the obs mesh
        # only exists with >1 device; single-chip runs the local
        # chain-chunked path.
        obs_shard = len(jax.devices()) > 1
    if obs_shard:
        # Production large-n path: the n×n working set sharded over an
        # obs mesh of ALL available devices (degenerates to 1-way on a
        # single chip — same code path BASELINE config 5 runs on a pod).
        from spearmint_tpu.engine import obs_shard as obs_mod

        mesh = obs_mod.make_obs_mesh()
        ndev = mesh.devices.size
        assert pad % ndev == 0, (pad, ndev)
        obs_fn = obs_mod.sharded_suggest_obs(mesh, cfg)

        def run(k, h):
            return obs_fn(k, h, xj, yj, mj, cj, cm)
    else:
        def run(k, h):
            return suggest_step(k, h, xj, yj, mj, pend, pend_mask, cj, cm,
                                cfg)

    def force(res):
        # On the experimental remote-TPU platform block_until_ready can
        # return before execution finishes; a host transfer of a value
        # that depends on the whole program cannot.  ONE device-side
        # scalar → one tunnel round trip (r1-r3 transferred two arrays,
        # adding ~0.1-0.2 s of pure tunnel latency per rep — see
        # BASELINE.md methodology note).
        return float(np.asarray(res.ei.sum() + res.hypers.ls.sum()))

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


def _measure_eval_cost(x, y, reps=3):
    """Wall time of one slice-sampler logprob eval at full n (cov
    assembly + cholesky + solve — the exact per-eval computation)."""
    import scipy.linalg as spla

    from spearmint_tpu.golden import numpy_ref as g

    n, d = x.shape
    ls = np.ones(d)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cov = 1.0 * (g.matern52(x, x, ls) + 1e-6 * np.eye(n)) + 1e-3 * np.eye(n)
        chol = spla.cholesky(cov, lower=True)
        spla.cho_solve((chol, True), y)
        ts.append(time.perf_counter() - t0)
    return ts


def _measure(fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts


def time_baseline(n, d, cands, mcmc_iters=10):
    """Calibrated reference-CPU suggestion latency at full n."""
    from spearmint_tpu.golden import numpy_ref as g

    evals_per_sweep = _count_eval_calls(min(n, 400), d)

    x, y, cand = make_problem(n, d, cands)
    ls = np.ones(d)
    eval_times = _measure_eval_cost(x, y)
    # min over reps: least load-sensitive estimate (favors the baseline)
    per_eval = min(eval_times)

    ei_times = _measure(lambda: g.compute_ei(x, y, cand, mean=0.0,
                                             amp2=1.0, noise=1e-3, ls=ls))
    ei_time = min(ei_times)

    # The calibrated denominator is load-sensitive (observed 2.4–9.6 ks
    # across round-1 runs); report [min-rep, max-rep] extrapolations so
    # the speedup is honest about that spread rather than a point claim.
    lo = mcmc_iters * (evals_per_sweep * min(eval_times) + min(ei_times))
    hi = mcmc_iters * (evals_per_sweep * max(eval_times) + max(ei_times))
    return mcmc_iters * (evals_per_sweep * per_eval + ei_time), {
        "evals_per_sweep": evals_per_sweep,
        "per_eval_s": per_eval,
        "ei_sweep_s": ei_time,
        "range_s": (lo, hi),
    }


def time_baseline_per_sec(n, d, cands, mcmc_iters=10):
    """Calibrated reference-CPU dual-GP (EI-per-second) latency.

    GPEIperSecChooser semantics (SURVEY.md §2 #4): per iteration the
    reference slice-samples BOTH hyperparameter sets (value GP and
    log-duration GP) — two full sweeps of O(n³) evals — then one EI
    sweep and one duration-GP posterior sweep over the candidates.
    """
    from spearmint_tpu.golden import numpy_ref as g

    evals_per_sweep = _count_eval_calls(min(n, 400), d)

    x, y, cand = make_problem(n, d, cands)
    ls = np.ones(d)
    eval_times = _measure_eval_cost(x, y)
    per_eval = min(eval_times)

    ei_times = _measure(lambda: g.compute_ei(x, y, cand, mean=0.0,
                                             amp2=1.0, noise=1e-3, ls=ls))
    post_times = _measure(lambda: g.posterior(x, y, cand, mean=0.0,
                                              amp2=1.0, noise=1e-3, ls=ls))

    def total(agg):
        return mcmc_iters * (2.0 * evals_per_sweep * agg(eval_times)
                             + agg(ei_times) + agg(post_times))

    return total(min), {
        "evals_per_sweep": evals_per_sweep,
        "per_eval_s": per_eval,
        "ei_sweep_s": min(ei_times),
        "time_post_s": min(post_times),
        "range_s": (total(min), total(max)),
    }


def time_baseline_async(n, d, cands, n_pending, mcmc_iters=10):
    """Calibrated reference-CPU pending-fantasization latency.

    Reference pending branch (SURVEY.md §3.2 ≈L200): per iteration,
    sample hypers at n, fantasize the P pending outcomes (augmented
    (n+P) Cholesky + posterior draw), then EI against the augmented
    data.  The reference draws ONE fantasy vector per iteration; the
    TPU engine averages 100 fantasy draws per sample (more work), so
    this denominator is conservative in the baseline's favor.
    """
    from spearmint_tpu.golden import numpy_ref as g

    evals_per_sweep = _count_eval_calls(min(n, 400), d)

    x, y, cand = make_problem(n, d, cands)
    rngp = np.random.RandomState(7)
    pend = rngp.rand(n_pending, d)
    ls = np.ones(d)
    eval_times = _measure_eval_cost(x, y)
    per_eval = min(eval_times)

    rng_f = np.random.RandomState(11)
    fant_times = _measure(lambda: g.fantasize(x, y, pend, mean=0.0,
                                              amp2=1.0, noise=1e-3, ls=ls,
                                              rng=rng_f))
    x_aug = np.vstack([x, pend])
    y_aug = np.concatenate([y, np.zeros(n_pending)])
    ei_times = _measure(lambda: g.compute_ei(x_aug, y_aug, cand, mean=0.0,
                                             amp2=1.0, noise=1e-3, ls=ls))

    def total(agg):
        return mcmc_iters * (evals_per_sweep * agg(eval_times)
                             + agg(fant_times) + agg(ei_times))

    return total(min), {
        "evals_per_sweep": evals_per_sweep,
        "per_eval_s": per_eval,
        "fantasize_s": min(fant_times),
        "ei_aug_sweep_s": min(ei_times),
        "range_s": (total(min), total(max)),
    }


def time_baseline_constrained(n, d, cands, mcmc_iters=10):
    """Calibrated reference-CPU constrained-EI (probit latent GP) latency.

    GPConstrainedEIChooser semantics (SURVEY.md §2 #17): per iteration
    the reference slice-samples the value-GP hypers over the valid
    observations (a full sweep of O(n³) evals), runs one constraint-
    model sweep (ESS latent moves sharing one factorization, a compwise
    ls move refactoring the n×n constraint covariance per evaluation,
    and a closed-form amp2 move — the golden model counts its own O(n³)
    factorizations), then sweeps the candidates with probit-weighted EI
    (one EI sweep + one probit predictive sweep)."""
    from spearmint_tpu.golden import numpy_ref as g

    evals_per_sweep = _count_eval_calls(min(n, 400), d)

    # constraint-sweep factorization count, geometry- not n-dependent
    n_small = min(n, 400)
    x_s, _, _ = make_problem(n_small, d, 16)
    rng = np.random.RandomState(2)
    z_s = np.where(rng.rand(n_small) > 0.25, 1.0, -1.0)
    cgp = g.GoldenConstrainedGP(d, n_small, seed=0)
    sweeps = 3
    for _ in range(sweeps):
        cgp.sample_constraint(x_s, z_s)
    chols_per_sweep = cgp.chol_count / sweeps

    x, y, cand = make_problem(n, d, cands)
    ls = np.ones(d)
    eval_times = _measure_eval_cost(x, y)

    ei_times = _measure(lambda: g.compute_ei(x, y, cand, mean=0.0,
                                             amp2=1.0, noise=1e-3, ls=ls))
    cgp_full = g.GoldenConstrainedGP(d, n, seed=0)
    pv_times = _measure(lambda: cgp_full.p_valid(x, cand))

    def total(agg):
        return mcmc_iters * (
            (evals_per_sweep + chols_per_sweep) * agg(eval_times)
            + agg(ei_times) + agg(pv_times))

    return total(min), {
        "evals_per_sweep": evals_per_sweep,
        "constraint_chols_per_sweep": chols_per_sweep,
        "per_eval_s": min(eval_times),
        "ei_sweep_s": min(ei_times),
        "p_valid_sweep_s": min(pv_times),
        "range_s": (total(min), total(max)),
    }


def time_tpu_per_sec(n, d, chains, cands, reps, lbfgs_iters=10,
                     grid_subset=5, chain_chunk=0, explicit_inverse=True):
    """Dual-GP EI/sec suggestion latency (BASELINE config 3)."""
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.engine.per_sec import suggest_step_per_sec
    from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states

    x, y, cand = make_problem(n, d, cands)
    rng = np.random.RandomState(5)
    log_durs = (2.0 * x[:, 0] + 0.1 * rng.randn(n)).astype(np.float32)
    pad = pad_bucket(n)
    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    tp = np.zeros(pad, np.float32); tp[:n] = log_durs
    mask = np.arange(pad) < n
    xj, yj, tj, mj = (jnp.array(xp), jnp.array(yp), jnp.array(tp),
                      jnp.array(mask))
    h = init_chain_states(yj, mj, d, chains)
    t = init_chain_states(tj, mj, d, chains)
    cj = jnp.array(cand, jnp.float32)
    cm = jnp.ones(cands, bool)
    cfg = SuggestConfig(mcmc_iters=1, grid_subset=grid_subset,
                        lbfgs_iters=lbfgs_iters, chain_chunk=chain_chunk,
                        explicit_inverse=explicit_inverse)
    key = jax.random.PRNGKey(0)
    pend = jnp.zeros((4, d), jnp.float32)
    pend_mask = jnp.zeros(4, bool)

    def run(k, h, t):
        return suggest_step_per_sec(k, h, t, xj, yj, tj, mj, pend,
                                    pend_mask, cj, cm, cfg)

    def force(res):
        return float(np.asarray(res.ei_per_s.sum()))

    res = run(key, h, t)
    force(res)
    h, t = res.hypers, res.time_hypers
    times = []
    for _ in range(reps):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        res = run(k, h, t)
        force(res)
        times.append(time.perf_counter() - t0)
        h, t = res.hypers, res.time_hypers
    return float(np.median(times))


def time_tpu_constrained(n, d, chains, cands, reps, lbfgs_iters=10,
                         grid_subset=5, chain_chunk=0,
                         explicit_inverse=True, p_invalid=0.25):
    """Constrained-EI (probit latent GP + ESS) suggestion latency.

    Not a BASELINE.json config (no golden dual-model denominator), but
    the dual-model chooser's large-n behaviour needs a measured row —
    VERDICT r3 next #5."""
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.engine.constrained import (
        ConstraintState, suggest_step_constrained,
    )
    from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states

    x, y, cand = make_problem(n, d, cands)
    rng = np.random.RandomState(3)
    valid = rng.rand(n) > p_invalid
    pad = pad_bucket(n)
    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = np.where(valid, y, 0.0)
    obs = np.arange(pad) < n
    vmask = np.zeros(pad, bool); vmask[:n] = valid
    xj, yj = jnp.array(xp), jnp.array(yp)
    vj, oj = jnp.array(vmask), jnp.array(obs)
    h = init_chain_states(yj, vj, d, chains)
    constraint = ConstraintState(
        ls=jnp.ones((chains, d), jnp.float32),
        amp2=jnp.ones((chains,), jnp.float32),
        ff=jnp.zeros((chains, pad), jnp.float32),
    )
    cj = jnp.array(cand, jnp.float32)
    cm = jnp.ones(cands, bool)
    cfg = SuggestConfig(mcmc_iters=1, grid_subset=grid_subset,
                        lbfgs_iters=lbfgs_iters, chain_chunk=chain_chunk,
                        explicit_inverse=explicit_inverse)
    key = jax.random.PRNGKey(0)

    def run(k, h, c):
        return suggest_step_constrained(k, h, c, xj, yj, vj, oj, cj, cm,
                                        cfg)

    def force(res):
        return float(np.asarray(res.acq.sum()))

    res = run(key, h, constraint)
    force(res)
    h, c = res.hypers, res.constraint
    times = []
    for _ in range(reps):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        res = run(k, h, c)
        force(res)
        times.append(time.perf_counter() - t0)
        h, c = res.hypers, res.constraint
    return float(np.median(times))


# The BASELINE.json benchmark configs (single-chip scalings of the
# pod-scale targets; chains shard over a mesh for the full versions).
# `flagship` (the default run, n=5000) is config 1's n=5k operating
# point; `per_sec` is config 3; `sweep1m` runs config 5's 1M-candidate
# EI sweep at a chip-feasible n (the full 10k×1M point is pod-scale:
# O(n²C) ≈ 2e14 FLOPs per posterior sample).
PRESETS = {
    # Branin parity: small-n regime, the canonical smoke test
    "branin": dict(n=30, d=2, chains=10, cands=2000),
    # Hartmann-6: 20 chains, 2k EI candidates
    "hartmann": dict(n=500, d=6, chains=20, cands=2048),
    # EI-per-second dual-GP chooser
    "per_sec": dict(n=1000, d=2, chains=10, cands=2048, _fn="per_sec"),
    # dual-GP at flagship scale through the threaded memory policy
    # (VERDICT r3 next #5: the dual-GP path's large-n behaviour)
    "per_sec_large": dict(n=5000, d=2, chains=10, cands=2048,
                          _fn="per_sec"),
    # constrained chooser (probit latent GP + ESS) at flagship scale
    "constrained": dict(n=5000, d=2, chains=10, cands=2048,
                        _fn="constrained"),
    # async: 64 pending fantasized (F=100 draws/sample)
    "async": dict(n=1000, d=2, chains=10, cands=2048, n_pending=64,
                  n_fantasies=100),
    # async at flagship scale: the pending path's augmented (n+P)
    # factorization through the fused kernel (VERDICT r4 next #3)
    "async_large": dict(n=5000, d=2, chains=10, cands=2048, n_pending=64,
                        n_fantasies=100, grid_subset=5, lbfgs_iters=10),
    # large-n: 10k observations through the production large-n route —
    # the obs-sharded path when a multi-device mesh exists, the local
    # chain-chunked path on a single chip (same gate as
    # GPEIOptChooser.next's use_obs: ndev > 1).  A 1-way obs mesh was
    # measured OOM at pad 10240 (XLA keeps ~16 live panel copies of the
    # colblock factorization's [N, N] carry, 17.4 GB > 15.75 GB HBM) —
    # and production never routes there.  chain_chunk=1 +
    # explicit_inverse=False bound the local path's [K, N, N] temps.
    "large": dict(n=10000, d=2, chains=4, cands=8192, chain_chunk=1,
                  explicit_inverse=False, obs_shard="auto"),
    # the 1M-candidate EI sweep (config 5's candidate axis, single chip)
    "sweep1m": dict(n=1000, d=2, chains=10, cands=1_000_000,
                    grid_subset=5, lbfgs_iters=10),
}

# presets whose CPU-golden baseline is feasible to measure in-run
_BASELINE_OK = {"branin", "hartmann", "large", "per_sec",
                "per_sec_large", "async", "async_large", "constrained",
                None}


def run_config(preset, n, d, chains, cands, reps, extra, skip_baseline):
    """Time one config; returns the result record (one JSON line)."""
    extra = dict(extra)
    fn_kind = extra.pop("_fn", "suggest")
    if fn_kind == "per_sec":
        tpu_latency = time_tpu_per_sec(n, d, chains, cands, reps, **extra)
    elif fn_kind == "constrained":
        tpu_latency = time_tpu_constrained(n, d, chains, cands, reps,
                                           **extra)
    else:
        tpu_latency = time_tpu(n, d, chains, cands, reps, **extra)

    if skip_baseline or preset not in _BASELINE_OK:
        baseline, detail, vs = float("nan"), {}, float("nan")
    else:
        if fn_kind == "per_sec":
            baseline, detail = time_baseline_per_sec(n, d, cands)
        elif fn_kind == "constrained":
            baseline, detail = time_baseline_constrained(n, d, cands)
        elif extra.get("n_pending", 0) > 0:
            baseline, detail = time_baseline_async(n, d, cands,
                                                   extra["n_pending"])
        else:
            baseline, detail = time_baseline(n, d, cands)
        vs = baseline / tpu_latency

    name = preset or f"n{n}_chains{chains}_cands{cands}"
    rec = {
        "metric": f"suggestion_latency_{name}",
        "value": round(tpu_latency, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
        "sweeps_per_s": round(chains / tpu_latency, 2),
        "ei_evals_per_s_chip": float(f"{chains * cands / tpu_latency:.3g}"),
    }
    if detail.get("range_s"):
        lo, hi = detail["range_s"]
        rec["vs_baseline_range"] = [round(lo / tpu_latency, 2),
                                    round(hi / tpu_latency, 2)]
    print(json.dumps(rec), flush=True)
    print(f"# {name}: baseline={baseline:.2f}s detail={detail}",
          file=sys.stderr)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--d", type=int, default=2)
    p.add_argument("--chains", type=int, default=10)
    p.add_argument("--cands", type=int, default=2000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    p.add_argument("--all", action="store_true",
                   help="run every BASELINE config; one JSON line each, "
                        "results also written to benchmarks/results.json")
    p.add_argument("--quick", action="store_true",
                   help="small shapes for smoke testing")
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--no-explicit-inverse", action="store_true",
                   help="triangular solves instead of materialized L^-1")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the image's sitecustomize "
                        "re-registers the remote-TPU backend regardless of "
                        "JAX_PLATFORMS, so the env var alone is not enough)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.all:
        records = []
        # flagship (the default single-line metric) first; --quick
        # shrinks it too so `--all --quick` smokes every preset in
        # minutes on CPU (VERDICT r2 missing #3)
        fn, fc, fr = args.n, args.cands, args.reps
        if args.quick:
            fn, fc, fr = min(fn, 256), min(fc, 256), min(fr, 2)
        records.append(run_config(None, fn, args.d, args.chains,
                                  fc, fr, {}, args.skip_baseline))
        for preset, cfg in PRESETS.items():
            cfg = dict(cfg)
            n, d = cfg.pop("n"), cfg.pop("d")
            chains, cands = cfg.pop("chains"), cfg.pop("cands")
            reps = args.reps
            if args.quick:
                n, cands, reps = min(n, 256), min(cands, 256), min(reps, 2)
                cfg.pop("chain_chunk", None)  # 256-pad needs no chunking
            try:
                records.append(run_config(preset, n, d, chains, cands,
                                           reps, cfg,
                                           args.skip_baseline))
            except Exception as e:  # record the failure, keep going
                print(f"# preset {preset} FAILED: {e}", file=sys.stderr)
                records.append({"metric": f"suggestion_latency_{preset}",
                                "error": str(e)})
        import os
        os.makedirs("benchmarks", exist_ok=True)
        with open("benchmarks/results.json", "w") as f:
            json.dump(records, f, indent=1)
        return 0

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

    run_config(args.preset, args.n, args.d, args.chains, args.cands,
               args.reps, extra, args.skip_baseline)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
