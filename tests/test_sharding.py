"""Sharded suggest over a virtual 8-device mesh: runs, and agrees with the
single-device result (GSPMD must not change the math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spearmint_tpu.engine.mesh import make_mesh, sharded_suggest
from spearmint_tpu.engine.suggest import (
    SuggestConfig,
    init_chain_states,
    suggest_step,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    n, pad, d, cands = 20, 32, 2, 64
    x = rng.rand(n, d).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)).astype(np.float32)
    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = np.arange(pad) < n
    cand = rng.rand(cands, d).astype(np.float32)
    yj, mj = jnp.array(yp), jnp.array(mask)
    hypers = init_chain_states(yj, mj, d, chains=8)
    return (jax.random.PRNGKey(0), hypers, jnp.array(xp), yj, mj,
            jnp.zeros((4, d), jnp.float32), jnp.zeros(4, bool),
            jnp.array(cand), jnp.ones(cands, bool))


def test_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must fake 8 CPU devices for sharding tests"
    )


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_unsharded(problem, shape):
    cfg = SuggestConfig(mcmc_iters=2, grid_subset=4, lbfgs_iters=8)
    want = suggest_step(*problem, cfg)
    mesh = make_mesh(chains_shards=shape[0], cand_shards=shape[1])
    got = sharded_suggest(mesh, cfg)(*problem)
    np.testing.assert_allclose(np.asarray(got.ei), np.asarray(want.ei),
                               rtol=2e-3, atol=1e-5)
    assert int(got.best_cand) == int(want.best_cand)
    np.testing.assert_allclose(np.asarray(got.x_opt), np.asarray(want.x_opt),
                               rtol=1e-2, atol=1e-3)
    for a, b in zip(jax.tree.leaves(got.hypers), jax.tree.leaves(want.hypers)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_sharded_pending_branch(problem):
    cfg = SuggestConfig(mcmc_iters=2, grid_subset=4, lbfgs_iters=8,
                        has_pending=True)
    args = list(problem)
    args[5] = jnp.array(np.random.RandomState(1).rand(4, 2), jnp.float32)
    args[6] = jnp.array([True, True, False, False])
    mesh = make_mesh(chains_shards=4, cand_shards=2)
    res = sharded_suggest(mesh, cfg)(*args)
    assert np.all(np.isfinite(np.asarray(res.ei)))
