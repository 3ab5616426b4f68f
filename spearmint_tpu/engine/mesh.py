"""Device-mesh construction and sharding specs for the suggest step.

The reference's "distributed backend" is SGE + a shared filesystem
(SURVEY.md §5.8); the rebuild's is a JAX device mesh with GSPMD:

  * axis ``chains`` — pure data parallelism over independent MCMC chains
    (chain states, per-sample caches, EI sample axis);
  * axis ``cand``   — the EI candidate batch (up to ~1M points); the
    global argmax is an XLA all-reduce over this axis;
  * (large-n) axis ``obs`` — reserved for sharding the n×n kernel matrix
    of the 10k-observation config; see ops/pallas notes.

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh; every host runs the same jitted program and GSPMD routes ICI
collectives in-slice and DCN across hosts.  All hosts compute the same
suggested point deterministically (same key, same reduction), so no
explicit broadcast is needed (SURVEY.md hard part #4).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spearmint_tpu.core.likelihood import GPHypers

CHAINS_AXIS = "chains"
CAND_AXIS = "cand"


def make_mesh(
    chains_shards: int | None = None,
    cand_shards: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a 2-D (chains, cand) mesh over the available devices.

    Defaults: all devices on the chains axis (chain parallelism is the
    highest-arithmetic-intensity axis — each shard runs whole Choleskys).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if chains_shards is None and cand_shards is None:
        chains_shards, cand_shards = n, 1
    elif chains_shards is None:
        chains_shards = n // cand_shards
    elif cand_shards is None:
        cand_shards = n // chains_shards
    if chains_shards * cand_shards != n:
        raise ValueError(
            f"mesh {chains_shards}x{cand_shards} != {n} devices"
        )
    grid = np.array(devices).reshape(chains_shards, cand_shards)
    return Mesh(grid, (CHAINS_AXIS, CAND_AXIS))


def suggest_shardings(mesh: Mesh):
    """(in_shardings, out_shardings=None) for ``suggest_step``.

    Order matches the positional signature of ``suggest_step``:
    (key, hypers, x, y, mask, pend, pend_mask, cand, cand_mask).
    Chain states shard over `chains`; the candidate set over `cand`;
    observations/pending replicate (they are O(n·D), tiny next to the
    per-chain Cholesky work).
    """
    rep = NamedSharding(mesh, P())
    by_chain = NamedSharding(mesh, P(CHAINS_AXIS))
    by_cand = NamedSharding(mesh, P(CAND_AXIS))
    hypers_sharding = GPHypers(
        mean=by_chain, amp2=by_chain, noise=by_chain,
        ls=NamedSharding(mesh, P(CHAINS_AXIS, None)),
    )
    in_shardings = (
        rep,               # key
        hypers_sharding,   # chain states
        rep, rep, rep,     # x, y, mask
        rep, rep,          # pend, pend_mask
        NamedSharding(mesh, P(CAND_AXIS, None)),  # cand
        by_cand,           # cand_mask
    )
    return in_shardings


def sharded_suggest(mesh: Mesh, config):
    """jit-compile suggest_step with mesh shardings applied to its inputs."""
    from spearmint_tpu.engine.suggest import suggest_step

    fn = lambda key, hypers, x, y, mask, pend, pend_mask, cand, cand_mask: (
        suggest_step(key, hypers, x, y, mask, pend, pend_mask, cand,
                     cand_mask, config)
    )
    return jax.jit(fn, in_shardings=suggest_shardings(mesh))
