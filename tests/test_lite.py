"""spearmint-lite surface: results.dat round-trip, pending fantasization
within a batch, varmap inverses."""

import os

import numpy as np
import pytest

from spearmint_tpu.choosers import get_chooser
from spearmint_tpu.harness import lite
from spearmint_tpu.store import codec, varmap

CONFIG = """
language: PYTHON
name: "obj"
variable { name: "x" type: FLOAT size: 2 min: -1 max: 3 }
variable { name: "k" type: INT size: 1 min: 0 max: 10 }
variable { name: "m" type: ENUM size: 1 options: "a" options: "b" options: "c" }
"""


@pytest.fixture
def config():
    return codec.parse_text_config(CONFIG)


def test_varmap_roundtrip(config):
    rng = np.random.RandomState(0)
    for _ in range(20):
        pt = rng.rand(4)
        typed = varmap.unit_to_typed(config.variables, pt)
        back = varmap.typed_to_unit(config.variables, [str(t) for t in typed])
        typed2 = varmap.unit_to_typed(config.variables, back)
        assert typed == typed2  # idempotent through the typed space


def test_varmap_row_length_check(config):
    with pytest.raises(ValueError):
        varmap.typed_to_unit(config.variables, ["0.5", "0.5"])


def test_parse_results(tmp_path, config):
    path = os.path.join(str(tmp_path), "results.dat")
    with open(path, "w") as f:
        f.write("1.5 10.0 0.0 1.0 5 b\n")
        f.write("P P 2.0 2.0 3 a\n")
        f.write("\n")
    comp, vals, durs, pend = lite.parse_results(path, config.variables)
    assert len(comp) == 1 and len(pend) == 1
    assert vals == [1.5] and durs == [10.0]
    typed = varmap.unit_to_typed(config.variables, comp[0])
    assert typed == [0.0, 1.0, 5, "b"]


def test_suggest_batch_appends_pending_rows(tmp_path, config):
    expt = str(tmp_path)
    with open(os.path.join(expt, "results.dat"), "w") as f:
        # a few seed observations of a simple quadratic
        rng = np.random.RandomState(0)
        for _ in range(6):
            u = rng.rand(4)
            typed = varmap.unit_to_typed(config.variables, u)
            val = (typed[0] - 1) ** 2 + (typed[1] - 1) ** 2
            f.write(f"{val} 1.0 " + " ".join(str(t) for t in typed) + "\n")
    chooser = get_chooser(
        "GPEIOptChooser", expt,
        "mcmc_iters=2,chains=3,burnin=10,grid_subset=3,lbfgs_iters=8",
    )
    rows = lite.suggest_batch(expt, config, chooser, n=2, grid_size=50,
                              grid_seed=1)
    assert len(rows) == 2
    comp, vals, durs, pend = lite.parse_results(
        os.path.join(expt, "results.dat"), config.variables)
    assert len(comp) == 6 and len(pend) == 2
    # second suggestion saw the first as pending → not a duplicate point
    assert not np.allclose(pend[0], pend[1])


def test_lite_cli_smoke(tmp_path, config):
    expt = str(tmp_path)
    with open(os.path.join(expt, "config.pb"), "w") as f:
        f.write(CONFIG)
    rc = lite.main([expt, "--n", "1", "--grid-size", "20",
                    "--chooser-module", "RandomChooser"])
    assert rc == 0
    comp, vals, durs, pend = lite.parse_results(
        os.path.join(expt, "results.dat"), config.variables)
    assert len(pend) == 1


def test_lite_never_resuggests_completed_points(tmp_path, config):
    """Base-grid rows matching observed/pending rows must leave the
    candidate set, or Random/Sequential choosers duplicate them."""
    from spearmint_tpu.store.sobol import sobol_grid

    expt = str(tmp_path)
    base = sobol_grid(4, 5, 1)
    with open(os.path.join(expt, "results.dat"), "w") as f:
        for i in range(4):  # evaluate the first 4 of 5 grid points
            typed = varmap.unit_to_typed(config.variables, base[i])
            f.write(f"{float(i)} 1.0 "
                    + " ".join(str(t) for t in typed) + "\n")
    chooser = get_chooser("SequentialChooser", expt, "")
    rows = lite.suggest_batch(expt, config, chooser, n=1, grid_size=5,
                              grid_seed=1)
    suggested = varmap.typed_to_unit(config.variables,
                                     [str(t) for t in rows[0]])
    comp, _, _, pend = lite.parse_results(
        os.path.join(expt, "results.dat"), config.variables)
    for pt in comp:
        assert not np.allclose(suggested, pt), "re-suggested an observed point"
    # and exhaustion raises instead of duplicating
    with pytest.raises(RuntimeError, match="exhausted"):
        lite.suggest_batch(expt, config, chooser, n=1, grid_size=5,
                           grid_seed=1)
