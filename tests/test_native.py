"""Native tier: C++ Sobol vs SciPy, and the C objective through the
SHELL runner path (SURVEY.md §2a)."""

import os
import shutil
import subprocess
from argparse import Namespace

import numpy as np
import pytest

from spearmint_tpu.ops import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_native_sobol_matches_scipy():
    if native.sobol_max_dim() == 0:
        pytest.skip("native library unavailable (no g++?)")
    from scipy.stats import qmc

    for dim in (1, 2, 5, native.sobol_max_dim()):
        got = native.sobol_generate(dim, 64, 0)
        want = qmc.Sobol(d=dim, scramble=False).random(64)
        np.testing.assert_allclose(got, want, atol=0)


def test_native_sobol_skip_semantics():
    if native.sobol_max_dim() == 0:
        pytest.skip("native library unavailable")
    from scipy.stats import qmc

    got = native.sobol_generate(3, 32, 17)
    eng = qmc.Sobol(d=3, scramble=False)
    eng.fast_forward(17)
    np.testing.assert_allclose(got, eng.random(32), atol=0)


def test_native_sobol_dimension_fallback():
    # beyond the embedded table → None (python falls back to scipy)
    beyond = native.sobol_max_dim() + 1
    assert native.sobol_generate(beyond, 8, 0) is None


@pytest.mark.slow
def test_braninc_shell_end_to_end(tmp_path):
    if shutil.which("cc") is None and shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    src_dir = os.path.join(REPO, "examples", "braninc")
    expt = str(tmp_path)
    shutil.copy(os.path.join(src_dir, "config.pb"), expt)
    shutil.copy(os.path.join(src_dir, "branin.c"), expt)
    shutil.copy(os.path.join(src_dir, "Makefile"), expt)
    subprocess.run(["make", "-C", expt], check=True, capture_output=True)

    from spearmint_tpu.choosers import get_chooser
    from spearmint_tpu.harness import sync as sync_mod
    from spearmint_tpu.store import codec
    from spearmint_tpu.store.experiment import ExperimentGrid

    config = codec.load_experiment(os.path.join(expt, "config.pb"))
    chooser = get_chooser("SequentialChooser", expt)
    options = Namespace(grid_size=50, grid_seed=1, max_finished_jobs=4)
    best_val, _ = sync_mod.run(expt, config, chooser, options)
    grid = ExperimentGrid(expt)
    assert len(grid.get_complete()) == 4
    # C objective really computed branin (values in the plausible range)
    vals = grid.values[grid.get_complete()]
    assert np.all(np.isfinite(vals)) and np.all(vals > 0.39) \
        and np.all(vals < 350)
