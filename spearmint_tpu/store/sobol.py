"""Sobol quasi-random candidate grid.

Parity: the reference ships a ~1000-line FORTRAN-port
(``spearmint/spearmint/sobol_lib.py``, SURVEY.md §2 #5) whose job is just
``i4_sobol_generate(dim, n, skip)`` — a low-discrepancy unit-hypercube
grid.  The rebuild uses two interchangeable backends:

  * a native C++ Sobol generator (``spearmint_tpu/ops/native``, built with
    the repo's Makefile; direction numbers from the classic primitive
    polynomials — the framework's host-side native component);
  * ``scipy.stats.qmc.Sobol`` as the always-available fallback.

``grid_seed`` is the reference's ``skip``: the number of initial points
fast-forwarded past, so two experiments with different seeds see different
(deterministic) grids.
"""

from __future__ import annotations

import numpy as np


def _scipy_sobol(num_dims: int, grid_size: int, grid_seed: int) -> np.ndarray:
    from scipy.stats import qmc

    eng = qmc.Sobol(d=num_dims, scramble=False)
    if grid_seed > 0:
        eng.fast_forward(grid_seed)
    return eng.random(grid_size)


def _native_sobol(num_dims: int, grid_size: int, grid_seed: int):
    from spearmint_tpu.ops import native

    return native.sobol_generate(num_dims, grid_size, grid_seed)


def sobol_grid(num_dims: int, grid_size: int, grid_seed: int = 1) -> np.ndarray:
    """(grid_size, num_dims) Sobol points in the unit hypercube."""
    try:
        pts = _native_sobol(num_dims, grid_size, grid_seed)
        if pts is not None:
            return pts
    except Exception:
        pass
    return _scipy_sobol(num_dims, grid_size, grid_seed)
