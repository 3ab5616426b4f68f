"""RandomForestEIChooser: protocol + suggestion sanity."""

import numpy as np
import pytest

pytest.importorskip("sklearn")

from spearmint_tpu.choosers import get_chooser


def _problem(rng, n_grid=200):
    grid = rng.rand(n_grid, 2)
    values = np.full(n_grid, np.nan)
    durations = np.full(n_grid, np.nan)
    return grid, values, durations


def test_bootstrap_and_argmax_near_minimum(tmp_path, rng):
    chooser = get_chooser("RandomForestEIChooser", str(tmp_path),
                          "n_trees=40,seed=1")
    grid, values, durations = _problem(rng)

    # bootstrap: < 2 completes → first candidate
    cands = np.arange(100, 200)
    got = chooser.next(grid, values, durations, cands, np.array([], int),
                       np.array([], int))
    assert got == 100

    # quadratic bowl at (0.25, 0.25), observed on the first 100 points
    complete = np.arange(100)
    values[complete] = np.sum((grid[complete] - 0.25) ** 2, axis=1)
    idx = chooser.next(grid, values, durations, cands, np.array([], int),
                       complete)
    assert idx in cands
    # suggestion should be in the low-value basin, not the far corner
    assert np.sum((grid[idx] - 0.25) ** 2) < np.median(
        np.sum((grid[cands] - 0.25) ** 2, axis=1))


def test_pending_fantasies_move_suggestion(tmp_path, rng):
    chooser = get_chooser("RandomForestEIChooser", str(tmp_path),
                          "n_trees=40,seed=1")
    grid, values, durations = _problem(rng)
    complete = np.arange(80)
    values[complete] = np.sum((grid[complete] - 0.25) ** 2, axis=1)
    cands = np.arange(100, 200)

    first = chooser.next(grid, values, durations, cands, np.array([], int),
                         complete)
    pend = np.array([first])
    second = chooser.next(grid, values, durations,
                          cands[cands != first], pend, complete)
    assert second != first
