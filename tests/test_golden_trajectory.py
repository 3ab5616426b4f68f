"""Frozen golden-trajectory drift guard (docs/ROADMAP.md item 4).

The archive (spearmint_tpu/golden/branin_trajectory.json) is a fixed-
seed sequential run of the NumPy golden chooser on Branin — the
reference's de-facto integration test (SURVEY.md §4) frozen into data.
Regenerating a prefix and comparing exactly catches any accidental
change to priors / slice sampler / EI immediately, where the
statistical parity tests would need many samples.
"""

import json
import os

import numpy as np
import pytest

ARCHIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spearmint_tpu", "golden", "branin_trajectory.json")


@pytest.fixture(scope="module")
def archive():
    with open(ARCHIVE) as f:
        return json.load(f)


def test_archive_converges(archive):
    best = [s["best"] for s in archive["steps"]]
    assert best == sorted(best, reverse=True)  # best-so-far is monotone
    assert best[-1] < 0.5  # near f*=0.397887 (grid-resolution-limited)
    assert best[-1] >= 0.397887 - 1e-9


def test_prefix_regenerates_exactly(archive):
    from spearmint_tpu.golden.trajectory import run_trajectory

    cfg = dict(archive["config"])
    cfg["iters"] = 6
    got = run_trajectory(**cfg)
    assert got["init_values"] == archive["init_values"]
    for g, w in zip(got["steps"], archive["steps"][:6]):
        assert g["index"] == w["index"]
        np.testing.assert_allclose(g["x"], w["x"], rtol=0, atol=0)
        np.testing.assert_allclose(g["value"], w["value"], rtol=1e-12)
        np.testing.assert_allclose(
            [g["hypers"]["mean"], g["hypers"]["amp2"], g["hypers"]["noise"]],
            [w["hypers"]["mean"], w["hypers"]["amp2"], w["hypers"]["noise"]],
            rtol=1e-9)


def test_tpu_engine_tracks_archive_posterior(archive):
    """The JAX engine's EI at the archived hypers must match the golden
    EI on the archived data to float32 accuracy (point-identical
    suggestion at the first archived step)."""
    import jax.numpy as jnp

    from spearmint_tpu.acquire import ei as jei
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.golden.numpy_ref import compute_ei
    from spearmint_tpu.golden.trajectory import branin_unit
    from spearmint_tpu.store.sobol import sobol_grid

    cfg = archive["config"]
    grid = sobol_grid(2, cfg["grid_size"], cfg["grid_seed"])
    X = grid[:cfg["init"]]
    Y = np.array([branin_unit(u) for u in X])
    h = archive["steps"][0]["hypers"]

    want = compute_ei(X, Y, grid, h["mean"], h["amp2"], h["noise"],
                      np.array(h["ls"]))
    pad = 8
    Xp = np.zeros((pad, 2), np.float32); Xp[:len(X)] = X
    Yp = np.zeros(pad, np.float32); Yp[:len(Y)] = Y
    mask = np.arange(pad) < len(X)
    hyp = GPHypers(mean=jnp.float32(h["mean"]), amp2=jnp.float32(h["amp2"]),
                   noise=jnp.float32(h["noise"]),
                   ls=jnp.array(h["ls"], jnp.float32))
    got = np.asarray(jei.compute_ei(
        jnp.array(Xp), jnp.array(Yp), jnp.array(mask), hyp,
        jnp.array(grid, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)
    assert int(np.argmax(got)) == int(np.argmax(want))


def test_engine_suggestions_land_in_golden_ei_region(archive):
    """Replay archived data prefixes through the JAX engine's
    suggest_step: at every replayed step the engine's chosen grid point
    must be a high-EI point under the golden's sample-averaged EI
    (distributional tolerance — the two samplers draw different
    hyperparameter samples, so argmax identity is not required;
    SURVEY.md §4 item 2)."""
    import jax
    import jax.numpy as jnp

    from spearmint_tpu.core.linalg import pad_bucket
    from spearmint_tpu.engine.suggest import (
        SuggestConfig,
        init_chain_states,
        suggest_step,
    )
    from spearmint_tpu.golden.numpy_ref import GoldenGP, compute_ei
    from spearmint_tpu.golden.trajectory import branin_unit
    from spearmint_tpu.mcmc.chains import MCMCConfig, sample_hypers
    from spearmint_tpu.store.sobol import sobol_grid

    cfg = archive["config"]
    grid = sobol_grid(2, cfg["grid_size"], cfg["grid_seed"])
    gridj = jnp.array(grid, jnp.float32)
    gmask = jnp.ones(grid.shape[0], bool)

    X0 = grid[:cfg["init"]]
    Y0 = np.array([branin_unit(u) for u in X0])

    for k in (0, 3, 6):
        xs = [s["x"] for s in archive["steps"][:k]]
        vals = [s["value"] for s in archive["steps"][:k]]
        X = np.vstack([X0] + [np.asarray(p)[None] for p in xs]) \
            if xs else X0
        Y = np.append(Y0, vals)
        n = len(Y)

        # golden sample-averaged EI on this prefix (fresh golden chain,
        # own burn-in — an independent draw from the same posterior)
        gp = GoldenGP(2, Y, seed=100 + k)
        for _ in range(30):
            gp.sample_hypers(X, Y)
        g_ei = np.zeros(grid.shape[0])
        n_samp = 40
        for _ in range(n_samp):
            mean, amp2, noise, ls = gp.sample_hypers(X, Y)
            g_ei += compute_ei(X, Y, grid, mean, amp2, noise, ls)
        g_ei /= n_samp

        # engine suggestion on the same prefix (grid-only EI)
        pad = pad_bucket(n)
        xp = np.zeros((pad, 2), np.float32); xp[:n] = X
        yp = np.zeros(pad, np.float32); yp[:n] = Y
        mask = np.arange(pad) < n
        xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
        chains = 10
        hypers = init_chain_states(yj, mj, 2, chains)
        key = jax.random.PRNGKey(k)
        mcfg = MCMCConfig()

        def burn(kk, h):
            def body(hh, k2):
                return sample_hypers(k2, hh, xj, yj, mj, mcfg), None
            out, _ = jax.lax.scan(body, h, jax.random.split(kk, 30))
            return out

        hypers = jax.jit(jax.vmap(burn))(
            jax.random.split(key, chains), hypers)
        res = suggest_step(
            jax.random.PRNGKey(1000 + k), hypers, xj, yj, mj,
            jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
            gridj, gmask, SuggestConfig(mcmc_iters=3, optimize=False))
        pick = int(res.best_cand)

        # Tolerance calibrated against golden-vs-golden variability:
        # independent 40-sample golden EI surfaces place each other's
        # argmax at 0.67-0.97 of their own max on these prefixes (the
        # surface is multi-modal mid-trajectory), so >=0.5 of max is the
        # honest MC-level "same EI region" bound.
        frac = g_ei[pick] / g_ei.max()
        assert frac >= 0.5, (k, pick, frac, int(np.argmax(g_ei)))
