"""End-to-end suggest_step behavior on a tiny problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.engine.suggest import (
    SuggestConfig,
    init_chain_states,
    suggest_step,
)


def _branin_like(n, rng):
    x = rng.rand(n, 2)
    # smooth 2-D objective with a clear minimum near (0.3, 0.4)
    y = ((x[:, 0] - 0.3) ** 2 + (x[:, 1] - 0.4) ** 2) * 10 + 0.05 * rng.randn(n)
    return x.astype(np.float32), y.astype(np.float32)


@pytest.fixture(scope="module")
def tiny_problem():
    rng = np.random.RandomState(42)
    n, pad, c = 12, 16, 32
    x, y = _branin_like(n, rng)
    xp = np.zeros((pad, 2), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = np.arange(pad) < n
    cand = rng.rand(c, 2).astype(np.float32)
    cand_mask = np.ones(c, bool)
    pend = np.zeros((4, 2), np.float32)
    pend_mask = np.zeros(4, bool)
    return dict(x=jnp.array(xp), y=jnp.array(yp), mask=jnp.array(mask),
                cand=jnp.array(cand), cand_mask=jnp.array(cand_mask),
                pend=jnp.array(pend), pend_mask=jnp.array(pend_mask),
                n=n, rng=rng)


def test_suggest_runs_and_improves(tiny_problem):
    p = tiny_problem
    cfg = SuggestConfig(mcmc_iters=3, grid_subset=4, lbfgs_iters=15)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=4)
    res = suggest_step(jax.random.PRNGKey(0), hypers, p["x"], p["y"], p["mask"],
                       p["pend"], p["pend_mask"], p["cand"], p["cand_mask"], cfg)
    # chain states updated & finite
    assert res.hypers.ls.shape == (4, 2)
    for leaf in jax.tree.leaves(res.hypers):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # EI over candidates nonnegative, argmax consistent
    ei = np.asarray(res.ei)
    assert ei.shape == (32,)
    assert np.all(ei >= -1e-6)
    assert int(res.best_cand) == int(np.argmax(ei))
    # optimized point in the unit box with EI >= grid EI (it refines top-k)
    x_opt = np.asarray(res.x_opt)
    assert np.all(x_opt >= 0) and np.all(x_opt <= 1)
    assert float(res.ei_opt) >= float(res.best_cand_ei) - 1e-5
    # samples: S = chains*iters
    assert res.samples.ls.shape == (12, 2)


def test_suggest_with_pending(tiny_problem):
    p = tiny_problem
    cfg = SuggestConfig(mcmc_iters=2, grid_subset=4, lbfgs_iters=10,
                        has_pending=True)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=2)
    pend = jnp.array(np.array([[0.31, 0.41], [0.9, 0.9], [0, 0], [0, 0]],
                              np.float32))
    pend_mask = jnp.array([True, True, False, False])
    res = suggest_step(jax.random.PRNGKey(1), hypers, p["x"], p["y"], p["mask"],
                       pend, pend_mask, p["cand"], p["cand_mask"], cfg)
    ei = np.asarray(res.ei)
    assert np.all(np.isfinite(ei))
    # fantasization suppresses EI near pending points: the candidate
    # closest to a pending point should not be the argmax
    d_to_pend = np.linalg.norm(
        np.asarray(p["cand"])[:, None] - np.asarray(pend)[None, :2], axis=-1
    ).min(1)
    assert d_to_pend[int(res.best_cand)] > d_to_pend.min() - 1e-9


def test_fantasy_axis_stabilizes_argmax(tiny_problem):
    """BASELINE config #4 structure: many pending jobs, fantasy draws
    batched per sample; more fantasies → the EI landscape converges
    (F=32 and F=64 agree on the argmax)."""
    p = tiny_problem
    rng = np.random.RandomState(3)
    pend = jnp.array(rng.rand(64, 2), jnp.float32)
    pmask = jnp.ones(64, bool)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=3)
    eis = {}
    for f in (32, 64):
        cfg = SuggestConfig(mcmc_iters=2, optimize=False, has_pending=True,
                            n_fantasies=f)
        res = suggest_step(jax.random.PRNGKey(0), hypers, p["x"], p["y"],
                           p["mask"], pend, pmask, p["cand"], p["cand_mask"],
                           cfg)
        eis[f] = np.asarray(res.ei)
        assert np.all(np.isfinite(eis[f]))
    corr = np.corrcoef(eis[32], eis[64])[0, 1]
    assert corr > 0.95, corr


def test_suggest_deterministic(tiny_problem):
    p = tiny_problem
    cfg = SuggestConfig(mcmc_iters=2, grid_subset=2, lbfgs_iters=5)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=2)
    args = (p["x"], p["y"], p["mask"], p["pend"], p["pend_mask"],
            p["cand"], p["cand_mask"], cfg)
    r1 = suggest_step(jax.random.PRNGKey(7), hypers, *args)
    r2 = suggest_step(jax.random.PRNGKey(7), hypers, *args)
    np.testing.assert_array_equal(np.asarray(r1.x_opt), np.asarray(r2.x_opt))
    np.testing.assert_array_equal(np.asarray(r1.ei), np.asarray(r2.ei))


def test_grid_only_mode(tiny_problem):
    p = tiny_problem
    cfg = SuggestConfig(mcmc_iters=2, optimize=False)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=2)
    res = suggest_step(jax.random.PRNGKey(0), hypers, p["x"], p["y"], p["mask"],
                       p["pend"], p["pend_mask"], p["cand"], p["cand_mask"], cfg)
    np.testing.assert_array_equal(
        np.asarray(res.x_opt), np.asarray(p["cand"])[int(res.best_cand)])


def test_memory_policy_resolution(tmp_path):
    """Auto memory policy (shared by GPEIOpt/per-sec/constrained
    choosers): small pads run unchunked with L-inverse; large pads chunk
    the chain axis (accounting for the 2x joint-cache m0 buffer) and
    drop the explicit inverse."""
    from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser

    ch = GPEIOptChooser(str(tmp_path), chains=10)
    assert ch._memory_policy(2048) == (0, True)      # small: plain vmap
    chunk, inv = ch._memory_policy(10240)            # large-n bucket
    assert 0 < chunk < 10 and 10 % chunk == 0        # chunked evenly
    assert inv is False                              # no [S, N, N] L^-1
    # explicit overrides win
    ch2 = GPEIOptChooser(str(tmp_path), chains=10, chain_chunk=5,
                         explicit_inverse=1)
    assert ch2._memory_policy(10240) == (5, True)


def test_nan_sample_excluded_from_ei_average(tiny_problem, monkeypatch):
    """A sample whose cache factorization fails (NaN alpha, e.g. at the
    f32 conditioning edge on TPU) must be excluded from the EI average
    instead of poisoning every candidate (engine/suggest.py ok-mask)."""
    from spearmint_tpu.acquire import ei as ei_mod

    p = tiny_problem
    cfg = SuggestConfig(mcmc_iters=2, grid_subset=2, lbfgs_iters=5)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=2)
    args = (p["x"], p["y"], p["mask"], p["pend"], p["pend_mask"],
            p["cand"], p["cand_mask"], cfg)
    clean = suggest_step(jax.random.PRNGKey(3), hypers, *args)
    assert np.isfinite(np.asarray(clean.ei)).all()

    orig = ei_mod.make_cache
    calls = {"n": 0}

    def poisoned(x, y, mask, h, kernel, with_inverse=False):
        c = orig(x, y, mask, h, kernel, with_inverse=with_inverse)
        calls["n"] += 1
        # NaN exactly one sample's alpha: under the S-axis vmap the
        # tracer sees all samples at once, so poison via a value-level
        # predicate on the sample's amp2 ordering instead — simplest:
        # NaN the lane with the largest amp2.
        import jax.numpy as jnp

        bad = h.amp2 == jnp.max(h.amp2)
        alpha = jnp.where(bad[..., None] if bad.ndim else bad,
                          jnp.nan, c.alpha)
        return c._replace(alpha=alpha)

    monkeypatch.setattr(ei_mod, "make_cache", poisoned)
    # a distinct static config forces a fresh trace (the clean call's
    # compiled executable would otherwise bypass the monkeypatch)
    cfg2 = SuggestConfig(mcmc_iters=2, grid_subset=3, lbfgs_iters=5)
    args2 = args[:-1] + (cfg2,)
    res = suggest_step(jax.random.PRNGKey(3), hypers, *args2)
    assert calls["n"] >= 1
    ei = np.asarray(res.ei)
    assert np.isfinite(ei).all(), "NaN sample leaked into the EI average"
    assert np.isfinite(float(res.ei_opt))
    # the finite samples still produce a usable (finite, in-bounds) pick
    assert np.all((np.asarray(res.x_opt) >= 0)
                  & (np.asarray(res.x_opt) <= 1))


def test_all_nan_samples_surface_n_ok_zero(tiny_problem):
    """If EVERY sample's cache factorization fails, the result must say
    so (n_ok == 0) instead of silently returning an argmax over an
    all-zero EI average (ADVICE r4: suggest.py:216)."""
    p = tiny_problem
    cfg = SuggestConfig(mcmc_iters=1, grid_subset=2, lbfgs_iters=3)
    hypers = init_chain_states(p["y"], p["mask"], 2, chains=2)
    # every chain pinned un-factorizable (amp2=inf → marginal −inf →
    # slice sampler stays put → NaN cache alphas)
    hypers = hypers._replace(amp2=jnp.full_like(hypers.amp2, jnp.inf))
    res = suggest_step(jax.random.PRNGKey(5), hypers, p["x"], p["y"],
                       p["mask"], p["pend"], p["pend_mask"], p["cand"],
                       p["cand_mask"], cfg)
    assert int(res.n_ok) == 0
    # the EI average itself stays finite (all zeros) — no NaN leak
    assert np.isfinite(np.asarray(res.ei)).all()
    # sanity: a clean run reports the full sample count
    clean = suggest_step(jax.random.PRNGKey(5),
                         init_chain_states(p["y"], p["mask"], 2, chains=2),
                         p["x"], p["y"], p["mask"], p["pend"],
                         p["pend_mask"], p["cand"], p["cand_mask"], cfg)
    assert int(clean.n_ok) == 2


def test_chooser_falls_back_on_degenerate_suggestion(tmp_path, monkeypatch):
    """n_ok == 0 → the chooser must NOT dispatch the meaningless argmax:
    it falls back to grid order and logs a suggest_degenerate event."""
    from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser
    from spearmint_tpu.engine import suggest as suggest_mod
    from spearmint_tpu.utils.events import EventLog

    orig = suggest_mod.suggest_step

    def degenerate(*args, **kwargs):
        res = orig(*args, **kwargs)
        return res._replace(n_ok=jnp.asarray(0, jnp.int32))

    monkeypatch.setattr(suggest_mod, "suggest_step", degenerate)
    rng = np.random.RandomState(1)
    chooser = GPEIOptChooser(str(tmp_path), mcmc_iters=1, chains=2,
                             burnin=2)
    grid = rng.rand(40, 2)
    values = np.full(40, np.nan)
    complete = np.arange(10)
    values[complete] = rng.rand(10)
    candidates = np.arange(10, 40)
    out = chooser.next(grid, values, np.full(40, np.nan), candidates, [],
                       complete)
    assert out == int(candidates[0])
    kinds = [e["kind"] for e in EventLog(str(tmp_path)).read()]
    assert "suggest_degenerate" in kinds


def test_band_gate_composition(tmp_path, monkeypatch):
    """The chooser's band_joint gate: OFF by default (measured no-go,
    docs/PROFILE_r5.md), and when opted in it engages only at
    band_joint_min+ pads on a TPU backend, never on the obs path."""
    from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser
    from spearmint_tpu.engine import suggest as suggest_mod

    seen = {}
    orig = suggest_mod.suggest_step

    def spy(*args, **kwargs):
        cfg = args[-1] if kwargs.get("config") is None else kwargs["config"]
        seen["band_joint"] = cfg.band_joint
        return orig(*args, **kwargs)

    monkeypatch.setattr(suggest_mod, "suggest_step", spy)
    rng = np.random.RandomState(1)
    grid = rng.rand(40, 2)
    values = np.full(40, np.nan)
    complete = np.arange(10)
    values[complete] = rng.rand(10)
    candidates = np.arange(10, 40)

    # default: off regardless of pad
    ch = GPEIOptChooser(str(tmp_path), mcmc_iters=1, chains=2, burnin=1)
    ch.next(grid, values, np.full(40, np.nan), candidates, [], complete)
    assert seen["band_joint"] is False
    # opted in, but pad (16) below the threshold → still off
    import os

    os.makedirs(str(tmp_path) + "2")
    ch2 = GPEIOptChooser(str(tmp_path) + "2", mcmc_iters=1, chains=2,
                         burnin=1, band_joint_min=2048)
    ch2.next(grid, values, np.full(40, np.nan), candidates, [], complete)
    assert seen["band_joint"] is False
    # opted in at a low threshold on the CPU backend → still off
    # (the gate requires a TPU backend: the win is Mosaic-specific)
    os.makedirs(str(tmp_path) + "3")
    ch3 = GPEIOptChooser(str(tmp_path) + "3", mcmc_iters=1, chains=2,
                         burnin=1, band_joint_min=16)
    ch3.next(grid, values, np.full(40, np.nan), candidates, [], complete)
    assert seen["band_joint"] is False
