"""obs-axis sharded GP primitives ≡ single-device reference.

Validates engine/obs_shard.py on the 8-virtual-CPU-device mesh
(SURVEY.md §4 distributed-tests-without-hardware strategy): the
distributed Cholesky / solves / log-marginal / posterior must match the
replicated core/linalg implementations to f32 accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.core import linalg
from spearmint_tpu.core.likelihood import GPHypers, cov_matrix, log_marginal
from spearmint_tpu.engine import obs_shard
from spearmint_tpu.acquire import ei as ei_mod

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


@pytest.fixture(scope="module")
def mesh():
    return obs_shard.make_obs_mesh()


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(3)
    n_true, n, d = 50, 64, 3
    x = np.zeros((n, d), np.float32)
    x[:n_true] = rng.rand(n_true, d)
    y = np.zeros(n, np.float32)
    y[:n_true] = np.sin(3 * x[:n_true, 0]) + 0.1 * rng.randn(n_true)
    mask = np.arange(n) < n_true
    return (jnp.array(x), jnp.array(y), jnp.array(mask))


HYP = dict(mean=0.1, amp2=0.8, noise=1e-2, ls=np.array([0.4, 0.7, 1.1]))


def _hypers():
    return GPHypers(mean=jnp.float32(HYP["mean"]),
                    amp2=jnp.float32(HYP["amp2"]),
                    noise=jnp.float32(HYP["noise"]),
                    ls=jnp.array(HYP["ls"], jnp.float32))


def test_cov_and_cholesky_match(mesh, problem):
    x, y, mask = problem
    h = _hypers()
    k = cov_matrix(x, mask, h.amp2, h.noise, h.ls)
    want = np.asarray(linalg.cholesky(k))

    from jax.sharding import PartitionSpec as P

    def dist(x, mask):
        a = obs_shard.cov_colblock(x, mask, h.amp2, h.noise, h.ls)
        return obs_shard.cholesky_colblock(a)

    got = jax.jit(jax.shard_map(
        dist, mesh=mesh, in_specs=(P(), P()),
        out_specs=P(None, obs_shard.OBS_AXIS), check_vma=False,
    ))(x, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_solves_match(mesh, problem):
    x, y, mask = problem
    h = _hypers()
    k = cov_matrix(x, mask, h.amp2, h.noise, h.ls)
    chol = linalg.cholesky(k)
    resid = jnp.where(mask, y - h.mean, 0.0)
    want_z = np.asarray(linalg.tri_solve(chol, resid[:, None]))[:, 0]

    from jax.sharding import PartitionSpec as P

    def dist(x, mask, r):
        a = obs_shard.cov_colblock(x, mask, h.amp2, h.noise, h.ls)
        l = obs_shard.cholesky_colblock(a)
        z = obs_shard.solve_colblock(l, r)
        w = obs_shard._backsolve(l, z)
        return z, w

    z, w = jax.jit(jax.shard_map(
        dist, mesh=mesh, in_specs=(P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    ))(x, mask, resid)
    np.testing.assert_allclose(np.asarray(z), want_z, rtol=2e-4, atol=2e-5)
    want_w = np.asarray(linalg.chol_solve(chol, resid))
    np.testing.assert_allclose(np.asarray(w), want_w, rtol=2e-3, atol=2e-4)


def test_logprob_matches(mesh, problem):
    x, y, mask = problem
    h = _hypers()
    want = float(log_marginal(x, y, mask, h))
    fn = obs_shard.sharded_logprob(mesh)
    got = float(fn(x, y, mask, h.mean, h.amp2, h.noise, h.ls))
    assert abs(got - want) / max(1.0, abs(want)) < 2e-4


def test_posterior_matches(mesh, problem):
    x, y, mask = problem
    h = _hypers()
    rng = np.random.RandomState(11)
    cand = jnp.array(rng.rand(17, x.shape[1]), jnp.float32)

    cache = ei_mod.make_cache(x, y, mask, h)
    want_mu, want_var = ei_mod.posterior_from_cache(cache, x, mask, cand)

    fn = obs_shard.sharded_posterior(mesh)
    mu, var = fn(x, y, mask, cand, h.mean, h.amp2, h.noise, h.ls)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(want_mu),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(want_var),
                               rtol=2e-3, atol=2e-4)


def test_sharded_slice_sweep_matches_single_device(mesh, problem):
    """A full slice-sampling hyperparameter sweep with the obs-sharded
    log-marginal must track the single-device sweep: identical keys →
    identical accept/reject paths up to f32 reduction-order noise."""
    from spearmint_tpu.mcmc.chains import MCMCConfig, init_hypers, sample_hypers

    x, y, mask = problem
    h0 = init_hypers(y, mask, x.shape[1])
    key = jax.random.PRNGKey(42)

    want = sample_hypers(key, h0, x, y, mask, MCMCConfig())
    fn = obs_shard.sharded_sample_hypers(mesh)
    got = fn(key, h0, x, y, mask)

    for name in ("mean", "amp2", "noise"):
        np.testing.assert_allclose(
            float(getattr(got, name)), float(getattr(want, name)),
            rtol=1e-3, err_msg=name)
    np.testing.assert_allclose(np.asarray(got.ls), np.asarray(want.ls),
                               rtol=1e-3)


def test_sharded_suggest_obs_matches_single_device(mesh, problem):
    """The full obs-sharded suggestion (MCMC sweeps + EI sweep + argmax)
    must reproduce the single-device suggest_step: same key → identical
    chain randomness, so hypers match exactly and EI to f32 accuracy."""
    from spearmint_tpu.engine.suggest import (
        SuggestConfig,
        init_chain_states,
        suggest_step,
    )

    x, y, mask = problem
    rng = np.random.RandomState(5)
    cand = jnp.array(rng.rand(100, x.shape[1]), jnp.float32)
    cand_mask = jnp.ones(100, bool)
    hypers = init_chain_states(y, mask, x.shape[1], chains=4)
    cfg = SuggestConfig(mcmc_iters=2, optimize=False)
    key = jax.random.PRNGKey(7)

    fn = obs_shard.sharded_suggest_obs(mesh, cfg)
    got = fn(key, hypers, x, y, mask, cand, cand_mask)
    want = suggest_step(
        key, hypers, x, y, mask,
        jnp.zeros((4, x.shape[1]), jnp.float32), jnp.zeros(4, bool),
        cand, cand_mask, cfg)

    assert int(got.best_cand) == int(want.best_cand)
    np.testing.assert_allclose(np.asarray(got.ei), np.asarray(want.ei),
                               rtol=2e-3, atol=1e-6)
    for name in ("mean", "amp2", "noise", "ls"):
        np.testing.assert_allclose(
            np.asarray(getattr(got.hypers, name)),
            np.asarray(getattr(want.hypers, name)), rtol=1e-3,
            err_msg=name)


def test_chooser_uses_obs_shard_path(tmp_path):
    """With obs_shard_min lowered, the flagship chooser routes through
    the obs mesh and reports it in the suggest event."""
    from spearmint_tpu.choosers import get_chooser
    from spearmint_tpu.utils.events import EventLog

    rng = np.random.RandomState(0)
    chooser = get_chooser(
        "GPEIOptChooser", str(tmp_path),
        "mcmc_iters=2,chains=2,burnin=5,obs_shard_min=32",
    )
    grid = rng.rand(80, 2)
    values = np.full(80, np.nan)
    complete = np.arange(30)   # pad_bucket(30)=32, divisible by 8 devices
    values[complete] = np.sin(3 * grid[complete, 0])
    candidates = np.arange(30, 80)
    out = chooser.next(grid, values, np.full(80, np.nan), candidates, [],
                       complete)
    assert isinstance(out, int) and out in candidates
    ev = [e for e in EventLog(str(tmp_path)).read()
          if e["kind"] == "suggest"][-1]
    assert ev["mode"] == "obs_shard"
    # pending jobs fall back to the chains path
    out2 = chooser.next(grid, values, np.full(80, np.nan),
                        candidates[1:], [int(candidates[0])], complete)
    ev2 = [e for e in EventLog(str(tmp_path)).read()
           if e["kind"] == "suggest"][-1]
    assert ev2["mode"] == "chains"


def test_nan_sample_excluded_from_obs_sharded_ei(mesh, problem):
    """One conditioning-failed sample must not poison the obs-sharded EI
    average (VERDICT r4 weak #3: the pod path at 10k+ obs is the MOST
    conditioning-exposed route and lacked the ok-mask the other three
    engines got).

    Natural poison: a chain pinned at amp2 = inf evaluates every
    log-marginal as −inf, so the slice sampler leaves it in place
    (shrink budget exhausts → stay put) and its samples' distributed
    factorizations produce NaN alphas.  Both the obs-sharded and the
    single-device engine must exclude those samples and agree.
    """
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states, suggest_step,
    )

    x, y, mask = problem
    rng = np.random.RandomState(9)
    cand = jnp.array(rng.rand(64, x.shape[1]), jnp.float32)
    cand_mask = jnp.ones(64, bool)
    chains, iters = 4, 2
    hypers = init_chain_states(y, mask, x.shape[1], chains=chains)
    # pin chain 0 at an un-movable, un-factorizable state
    hypers = hypers._replace(
        amp2=hypers.amp2.at[0].set(jnp.inf))
    cfg = SuggestConfig(mcmc_iters=iters, optimize=False)
    key = jax.random.PRNGKey(11)

    got = obs_shard.sharded_suggest_obs(mesh, cfg)(
        key, hypers, x, y, mask, cand, cand_mask)
    want = suggest_step(
        key, hypers, x, y, mask,
        jnp.zeros((4, x.shape[1]), jnp.float32), jnp.zeros(4, bool),
        cand, cand_mask, cfg)

    # the poisoned chain's samples are excluded, not averaged in
    assert int(got.n_ok) == (chains - 1) * iters
    assert int(want.n_ok) == (chains - 1) * iters
    ei = np.asarray(got.ei)
    assert np.isfinite(ei).all(), "NaN sample leaked into obs-sharded EI"
    assert ei.max() > 0.0
    np.testing.assert_allclose(ei, np.asarray(want.ei), rtol=2e-3,
                               atol=1e-6)
    assert int(got.best_cand) == int(want.best_cand)


def test_sharded_suggest_per_sec_matches_single_device(mesh, problem):
    """The obs-sharded dual-GP EI/sec suggestion (VERDICT r4 next #5)
    must reproduce the single-device suggest_step_per_sec: same key →
    identical chain randomness for both families."""
    from spearmint_tpu.engine.per_sec import suggest_step_per_sec
    from spearmint_tpu.engine.suggest import (
        SuggestConfig, init_chain_states,
    )

    x, y, mask = problem
    rng = np.random.RandomState(6)
    log_durs = jnp.array(
        np.where(np.asarray(mask), 1.0 + rng.rand(x.shape[0]), 0.0),
        jnp.float32)
    cand = jnp.array(rng.rand(64, x.shape[1]), jnp.float32)
    cand_mask = jnp.ones(64, bool)
    hypers = init_chain_states(y, mask, x.shape[1], chains=4)
    t_hypers = init_chain_states(log_durs, mask, x.shape[1], chains=4)
    cfg = SuggestConfig(mcmc_iters=2, optimize=False)
    key = jax.random.PRNGKey(13)

    got = obs_shard.sharded_suggest_per_sec(mesh, cfg)(
        key, hypers, t_hypers, x, y, log_durs, mask, cand, cand_mask)
    want = suggest_step_per_sec(
        key, hypers, t_hypers, x, y, log_durs, mask,
        jnp.zeros((4, x.shape[1]), jnp.float32), jnp.zeros(4, bool),
        cand, cand_mask, cfg)

    assert int(got.best_cand) == int(want.best_cand)
    np.testing.assert_allclose(np.asarray(got.ei_per_s),
                               np.asarray(want.ei_per_s), rtol=2e-3,
                               atol=1e-7)
    for fam in ("hypers", "time_hypers"):
        for name in ("mean", "amp2", "noise", "ls"):
            np.testing.assert_allclose(
                np.asarray(getattr(getattr(got, fam), name)),
                np.asarray(getattr(getattr(want, fam), name)),
                rtol=1e-3, err_msg=f"{fam}.{name}")
    assert int(got.n_ok) == 8


def test_per_sec_chooser_uses_obs_shard_path(tmp_path):
    """The per-sec chooser routes through the shared use_obs gate."""
    from spearmint_tpu.choosers import get_chooser
    from spearmint_tpu.utils.events import EventLog

    rng = np.random.RandomState(0)
    chooser = get_chooser(
        "GPEIperSecChooser", str(tmp_path),
        "mcmc_iters=2,chains=2,burnin=2,obs_shard_min=32",
    )
    grid = rng.rand(80, 2)
    values = np.full(80, np.nan)
    durations = np.full(80, np.nan)
    complete = np.arange(30)
    values[complete] = np.sin(3 * grid[complete, 0])
    durations[complete] = 1.0 + grid[complete, 1]
    candidates = np.arange(30, 80)
    out = chooser.next(grid, values, durations, candidates, [], complete)
    assert (isinstance(out, (int, np.integer)) and out in candidates) or (
        isinstance(out, tuple) and len(out) == 2)
    ev = [e for e in EventLog(str(tmp_path)).read()
          if e["kind"] == "suggest"][-1]
    assert ev["mode"] == "obs_shard"
