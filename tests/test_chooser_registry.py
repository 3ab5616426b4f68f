"""Every chooser in the registry constructs and produces a valid
suggestion through the reference ``next(...)`` protocol.

The flagship and dual-model choosers have deep dedicated suites
(test_suggest / test_per_sec / test_constrained / test_rf_chooser /
test_e2e_*); this closes the registry-breadth gap — GPEIChooser (the
grid-only variant) and GridChooser previously had no direct coverage
(SURVEY.md §2 #17 lists all of them as reference components).
"""

import numpy as np
import pytest

from spearmint_tpu.choosers import _KNOWN, get_chooser


def _toy(n_complete=4):
    rng = np.random.RandomState(0)
    grid = rng.rand(24, 2)
    complete = np.arange(n_complete)
    values = np.sin(3 * grid[complete, 0])
    durations = np.full(n_complete, 0.5)
    candidates = np.arange(n_complete, 24)
    pending = np.array([], int)
    return grid, values, durations, candidates, pending, complete


@pytest.mark.parametrize("name", _KNOWN)
def test_chooser_produces_valid_suggestion(name, tmp_path):
    args = ("mcmc_iters=2,burnin=3,chains=2" if name.startswith("GP")
            else "")
    ch = get_chooser(name, str(tmp_path), args)
    grid, values, durations, candidates, pending, complete = _toy()
    out = ch.next(grid, values, durations, candidates, pending, complete)
    if isinstance(out, tuple):
        ei, pt = out
        assert np.isfinite(float(ei))
        pt = np.asarray(pt)
        assert pt.shape == (2,)
        assert np.all((pt >= 0) & (pt <= 1))
    else:
        assert int(out) in set(int(c) for c in candidates)


def test_unknown_chooser_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown chooser"):
        get_chooser("NoSuchChooser", str(tmp_path))


def test_gpei_chooser_never_invents_off_grid_points(tmp_path):
    """GPEIChooser = flagship machinery with optimize disabled: the
    suggestion must always be a grid index (reference ≈250-LoC
    grid-only variant)."""
    ch = get_chooser("GPEIChooser", str(tmp_path),
                     "mcmc_iters=2,burnin=3,chains=2")
    grid, values, durations, candidates, pending, complete = _toy()
    for _ in range(3):
        out = ch.next(grid, values, durations, candidates, pending,
                      complete)
        assert not isinstance(out, tuple)
        assert int(out) in set(int(c) for c in candidates)


def test_grid_chooser_walks_in_order(tmp_path):
    ch = get_chooser("GridChooser", str(tmp_path))
    grid, values, durations, candidates, pending, complete = _toy()
    assert ch.next(grid, values, durations, candidates, pending,
                   complete) == int(candidates[0])
