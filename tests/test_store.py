"""Store layer: codec parsing, grid state machine, locking, sobol."""

import json
import multiprocessing as mp
import os

import numpy as np
import pytest

from spearmint_tpu.store import codec, sobol
from spearmint_tpu.store.experiment import ExperimentGrid
from spearmint_tpu.store.locker import Locker

CONFIG_PB = """
# comment
language: PYTHON
name: "branin"
variable {
 name: "X"
 type: FLOAT
 size: 2
 min: -5
 max: 10
}
variable {
 name: "k"
 type: INT
 size: 1
 min: 0
 max: 4
}
variable {
 name: "act"
 type: ENUM
 size: 1
 options: "relu"
 options: "tanh"
}
"""


def test_parse_text_config():
    cfg = codec.parse_text_config(CONFIG_PB)
    assert cfg.name == "branin"
    assert cfg.language == "PYTHON"
    assert [v.name for v in cfg.variables] == ["X", "k", "act"]
    assert cfg.variables[0].size == 2 and cfg.variables[0].min == -5
    assert cfg.variables[2].options == ["relu", "tanh"]
    assert cfg.grid_dims == 4


def test_parse_json_config():
    d = {"name": "e", "language": "PYTHON",
         "variables": [{"name": "x", "type": "FLOAT", "size": 1,
                        "min": 0, "max": 1}]}
    cfg = codec.parse_json_config(json.dumps(d))
    assert cfg.grid_dims == 1


def test_parse_rejects_bad_config():
    with pytest.raises(ValueError):
        codec.parse_text_config('variable { name: "x" type: FLOAT }')
    with pytest.raises(ValueError):
        codec.parse_text_config(
            'language: KLINGON name: "x" '
            'variable { name: "x" type: FLOAT min: 0 max: 1 }')
    with pytest.raises(ValueError):
        codec.parse_text_config('variable { name: "e" type: ENUM }')


def test_job_roundtrip(tmp_path):
    job = codec.Job(id=7, expt_dir=str(tmp_path), name="branin",
                    language="PYTHON",
                    params=[codec.Parameter(name="X", dbl_val=[0.1, 0.9])])
    path = codec.save_job(job)
    back = codec.load_job(path)
    assert back.id == 7 and back.params[0].dbl_val == [0.1, 0.9]
    d = codec.params_to_dict(back.params)
    np.testing.assert_allclose(d["X"], [0.1, 0.9])


def test_grid_lifecycle(tmp_path):
    cfg = codec.parse_text_config(CONFIG_PB)
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=50,
                          grid_seed=1)
    assert grid.grid.shape == (50, 4)
    assert len(grid.get_candidates()) == 50
    # lifecycle: candidate -> submitted -> running -> complete
    grid.set_submitted(3, proc_id=42)
    assert 3 in grid.get_pending() and grid.get_proc_id(3) == 42
    ExperimentGrid.job_running(str(tmp_path), 3)
    grid2 = ExperimentGrid(str(tmp_path))
    assert 3 in grid2.get_running()
    ExperimentGrid.job_complete(str(tmp_path), 3, 1.25, 0.5)
    grid3 = ExperimentGrid(str(tmp_path))
    assert 3 in grid3.get_complete()
    assert grid3.get_best() == (1.25, 3)
    # broken
    grid3.set_submitted(5)
    ExperimentGrid.job_broken(str(tmp_path), 5)
    assert 5 in ExperimentGrid(str(tmp_path)).get_broken()


def test_grid_params_decoding(tmp_path):
    cfg = codec.parse_text_config(CONFIG_PB)
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=8)
    grid.grid[0] = np.array([0.0, 1.0, 0.5, 0.99])
    params = grid.get_params(0)
    assert params[0].dbl_val == [-5.0, 10.0]       # FLOAT scaled
    assert params[1].int_val == [2]                # INT rounded
    assert params[2].str_val == ["tanh"]           # ENUM indexed
    flat = grid.unit_to_list(0)
    assert flat == [-5.0, 10.0, 2, "tanh"]


def test_add_to_grid(tmp_path):
    cfg = codec.parse_text_config(CONFIG_PB)
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=8)
    idx = grid.add_to_grid(np.array([0.5, 0.5, 0.5, 0.5]))
    assert idx == 8
    fresh = ExperimentGrid(str(tmp_path))
    assert fresh.grid.shape == (9, 4)
    assert idx in fresh.get_candidates()


def test_grid_resume(tmp_path):
    cfg = codec.parse_text_config(CONFIG_PB)
    g1 = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=10)
    g1.set_complete(2, 0.7, 1.0)
    # reopening without variables resumes from disk
    g2 = ExperimentGrid(str(tmp_path))
    np.testing.assert_array_equal(g1.grid, g2.grid)
    assert g2.get_best() == (0.7, 2)


def _lock_holder(path, hold, q):
    lk = Locker(path)
    lk.lock_wait()
    q.put("locked")
    import time

    time.sleep(hold)
    lk.unlock()


def test_locker_mutual_exclusion(tmp_path):
    path = str(tmp_path / "x")
    q = mp.Queue()
    p = mp.Process(target=_lock_holder, args=(path, 0.6, q))
    p.start()
    assert q.get(timeout=5) == "locked"
    lk = Locker(path)
    assert not lk.lock()          # other process holds it
    assert lk.lock_wait(timeout=5)  # acquired after release
    lk.unlock()
    p.join()


def test_sobol_determinism_and_range():
    a = sobol.sobol_grid(3, 100, grid_seed=1)
    b = sobol.sobol_grid(3, 100, grid_seed=1)
    c = sobol.sobol_grid(3, 100, grid_seed=7)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (100, 3)
    assert np.all(a >= 0) and np.all(a < 1)
    # low discrepancy: each dim covers the range decently
    assert np.all(a.max(0) > 0.8) and np.all(a.min(0) < 0.2)


def test_proc_id_write_preserves_completed_status(tmp_path):
    """Dispatch race: the runner completes a job between driver.submit_job
    returning and the loop recording the proc id.  set_proc_id must not
    regress status (set_submitted here would, and detect_broken would then
    destroy the result)."""
    cfg = codec.parse_text_config(CONFIG_PB)
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=10)
    grid.set_submitted(4)
    # fast runner wins the race
    ExperimentGrid.job_running(str(tmp_path), 4)
    ExperimentGrid.job_complete(str(tmp_path), 4, 0.42, 0.01)
    # loop records the proc id afterwards
    grid.set_proc_id(4, 9999)
    fresh = ExperimentGrid(str(tmp_path))
    assert 4 in fresh.get_complete()
    assert fresh.get_best() == (0.42, 4)
    assert fresh.get_proc_id(4) == 9999


def test_set_broken_if_pending_never_clobbers_completed(tmp_path):
    """Failure-detection race, fully closed (r5): the liveness probe
    says the process vanished, but the runner completes the job before
    the broken flip.  set_broken_if_pending's check and flip share one
    locked read-modify-write, so the result survives."""
    cfg = codec.parse_text_config(CONFIG_PB)
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=10)
    grid.set_submitted(3, proc_id=12345)
    # runner completes in the gap between the probe and the flip
    ExperimentGrid.job_complete(str(tmp_path), 3, 0.7, 0.5)
    assert grid.set_broken_if_pending(3) is False
    fresh = ExperimentGrid(str(tmp_path))
    assert 3 in fresh.get_complete()
    assert float(fresh.values[3]) == 0.7
    # and a genuinely dead pending job still flips
    grid.set_submitted(5, proc_id=23456)
    assert grid.set_broken_if_pending(5) is True
    assert 5 in ExperimentGrid(str(tmp_path)).get_broken()
