"""End-to-end constrained BO: objective returns NaN in a violating
region; the sync harness + GPConstrainedEIChooser steer around it."""

import os
from argparse import Namespace

import numpy as np
import pytest

from spearmint_tpu.choosers import get_chooser
from spearmint_tpu.harness import sync as sync_mod
from spearmint_tpu.store import codec
from spearmint_tpu.store.experiment import ExperimentGrid

CONFIG = """
language: PYTHON
name: "objective"
variable { name: "x" type: FLOAT size: 2 min: 0 max: 1 }
"""

# quadratic with minimum at (0.2, 0.5); x0 > 0.65 is infeasible
OBJECTIVE = """
import math

def main(job_id, params):
    x = params["x"]
    if float(x[0]) > 0.65:
        return float("nan")
    return 10 * ((float(x[0]) - 0.2) ** 2 + (float(x[1]) - 0.5) ** 2)
"""


@pytest.mark.slow
def test_constrained_sync_run(tmp_path):
    expt = str(tmp_path)
    with open(os.path.join(expt, "config.pb"), "w") as f:
        f.write(CONFIG)
    with open(os.path.join(expt, "objective.py"), "w") as f:
        f.write(OBJECTIVE)
    config = codec.load_experiment(os.path.join(expt, "config.pb"))
    chooser = get_chooser(
        "GPConstrainedEIChooser", expt,
        "mcmc_iters=2,chains=3,grid_subset=3,lbfgs_iters=10",
    )
    options = Namespace(grid_size=100, grid_seed=1, max_finished_jobs=14)
    best_val, best_id = sync_mod.run(expt, config, chooser, options)
    grid = ExperimentGrid(expt)
    complete = grid.get_complete()
    assert len(complete) == 14
    vals = grid.values[complete]
    # NaN violations recorded as complete-with-NaN, never the best
    assert np.isfinite(best_val)
    assert best_val < 2.0, best_val
    # the harness kept going after violations
    assert np.any(np.isnan(vals)) or np.all(grid.grid[complete, 0] <= 0.66)
