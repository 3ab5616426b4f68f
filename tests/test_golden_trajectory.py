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
