"""Fixed-seed golden BO trajectory on Branin-Hoo (reference semantics).

The reference has no test suite; its de-facto golden is "run
examples/braninpy and watch best→0.398" (SURVEY.md §4).  This module
freezes that check: a deterministic, sequential, single-chain run of
the pure-NumPy golden re-derivation (numpy_ref) on Branin, driven the
way ``spearmint_sync.py`` drives the reference chooser — persistent
chain state, burn-in on the first suggestion, EI argmax over a Sobol
candidate grid (SURVEY.md §3.2/§3.4).

``bin/gen_golden_trajectory.py`` archives the result as
``branin_trajectory.json``; ``tests/test_golden_trajectory.py`` regen-
erates a prefix and compares exactly, so any accidental change to the
golden math (priors, slice sampler, EI) is caught even where the
statistical parity tests would need many samples to notice.

Caveat: exactness holds for a fixed NumPy/SciPy/BLAS build (slice
sampling branches on float compares, so cross-BLAS drift is possible).
If the environment changes legitimately, re-run the generator.
"""

from __future__ import annotations

import numpy as np

from spearmint_tpu.golden.numpy_ref import GoldenGP, compute_ei
from spearmint_tpu.store.sobol import sobol_grid

# Branin-Hoo on [0,1]² (examples/braninpy/branin.py scaling);
# global minimum f* = 0.397887.
def branin_unit(u: np.ndarray) -> float:
    x = 15.0 * u[0] - 5.0
    y = 15.0 * u[1]
    v = (y - (5.1 / (4 * np.pi**2)) * x**2 + (5 / np.pi) * x - 6) ** 2
    v += 10 * (1 - 1 / (8 * np.pi)) * np.cos(x) + 10
    return float(v)


def run_trajectory(iters=30, init=4, grid_size=800, mcmc_iters=10,
                   burnin=20, seed=0, grid_seed=1):
    """Sequential golden BO loop; returns a JSON-able trajectory dict."""
    grid = sobol_grid(2, grid_size, grid_seed)
    X = grid[:init].copy()
    Y = np.array([branin_unit(u) for u in X])
    gp = GoldenGP(2, Y, seed=seed)
    for _ in range(burnin):
        gp.sample_hypers(X, Y)

    steps = []
    for _ in range(iters):
        ei_sum = np.zeros(grid_size)
        for _ in range(mcmc_iters):
            mean, amp2, noise, ls = gp.sample_hypers(X, Y)
            ei_sum += compute_ei(X, Y, grid, mean, amp2, noise, ls)
        idx = int(np.argmax(ei_sum / mcmc_iters))
        u = grid[idx]
        val = branin_unit(u)
        steps.append({
            "index": idx,
            "x": [float(u[0]), float(u[1])],
            "value": val,
            "best": float(min(val, Y.min())),
            "hypers": {"mean": gp.mean, "amp2": gp.amp2,
                       "noise": gp.noise, "ls": [float(l) for l in gp.ls]},
        })
        X = np.vstack([X, u[None]])
        Y = np.append(Y, val)

    return {
        "config": {"iters": iters, "init": init, "grid_size": grid_size,
                   "mcmc_iters": mcmc_iters, "burnin": burnin,
                   "seed": seed, "grid_seed": grid_seed},
        "init_values": [float(v) for v in Y[:init]],
        "steps": steps,
    }
