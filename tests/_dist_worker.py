"""Worker process for tests/test_distributed.py.

Each of 2 processes contributes its 1 local CPU device to a global
2-device `chains` mesh, runs the SAME jitted sharded suggestion, and
prints the result — the parent asserts both printed identical
suggestions (SURVEY.md hard part #4: deterministic multi-host
agreement, no leader broadcast).
"""

import sys


def main():
    proc_id, port = int(sys.argv[1]), sys.argv[2]
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from spearmint_tpu.engine import distributed

    distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=proc_id)
    assert jax.device_count() == 2 and len(jax.local_devices()) == 1
    assert distributed.is_coordinator() == (proc_id == 0)

    import jax.numpy as jnp
    import numpy as np

    from spearmint_tpu.engine.mesh import (
        make_mesh,
        sharded_suggest,
        suggest_shardings,
    )
    from spearmint_tpu.engine.suggest import SuggestConfig, init_chain_states

    # deterministic tiny problem — identical on both processes
    rng = np.random.RandomState(0)
    n, pad, d, chains, cands = 20, 24, 2, 4, 32
    x = rng.rand(n, d).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)).astype(np.float32)
    xp = np.zeros((pad, d), np.float32); xp[:n] = x
    yp = np.zeros(pad, np.float32); yp[:n] = y
    mask = np.arange(pad) < n
    cand = rng.rand(cands, d).astype(np.float32)

    xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
    hypers = init_chain_states(yj, mj, d, chains)
    args = (
        jax.random.PRNGKey(0), hypers, xj, yj, mj,
        jnp.zeros((4, d), jnp.float32), jnp.zeros(4, bool),
        jnp.array(cand), jnp.ones(cands, bool),
    )

    mesh = make_mesh(chains_shards=2, cand_shards=1)
    shardings = suggest_shardings(mesh)
    # device_put with a cross-process NamedSharding: every process holds
    # the same global host value and contributes its addressable shards.
    put = jax.tree.map(jax.device_put, args, shardings)

    config = SuggestConfig(mcmc_iters=2, grid_subset=2, lbfgs_iters=5)
    res = sharded_suggest(mesh, config)(*put)
    ei_sum = float(jnp.sum(res.ei))
    x_opt = [f"{float(v):.6f}" for v in np.asarray(res.x_opt)]
    print(f"RESULT best={int(res.best_cand)} "
          f"ei={float(res.best_cand_ei):.6f} eisum={ei_sum:.5f} "
          f"xopt={x_opt}", flush=True)


if __name__ == "__main__":
    main()
