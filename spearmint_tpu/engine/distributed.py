"""Multi-host initialization and deterministic-agreement helpers.

The reference's multi-machine story is a shared filesystem + SGE
(SURVEY.md §5.8); the rebuild's compute tier scales across hosts with
``jax.distributed``: every host runs the SAME jitted suggest program
over one global mesh, GSPMD routes ICI collectives in-slice and DCN
across hosts, and — because the program is deterministic in (key,
state, data) — every host computes the identical suggested point, so no
leader broadcast is needed (SURVEY.md hard part #4).  The experiment
store stays host-side on the shared filesystem, written only by the
process that owns the suggest loop.

Typical pod-scale wiring::

    from spearmint_tpu.engine import distributed, mesh
    distributed.initialize()                  # env-driven (coordinator etc.)
    m = mesh.make_mesh(chains_shards=jax.device_count() // 2,
                       cand_shards=2)
    step = mesh.sharded_suggest(m, config)
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` passthrough (env-driven when args
    are None — the standard TPU pod bootstrap)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    return jax.process_index() == 0
