"""Harness tests: runner languages, fake-driver dispatch loop, broken-job
detection, crash/resume (SURVEY.md §4 item 4)."""

import os
import shutil
import stat
import subprocess
import sys
import time
from argparse import Namespace

import numpy as np
import pytest

from spearmint_tpu.choosers import get_chooser
from spearmint_tpu.harness import loop
from spearmint_tpu.harness.drivers import get_driver
from spearmint_tpu.harness.main import attempt_dispatch
from spearmint_tpu.harness.runner import job_runner
from spearmint_tpu.store import codec
from spearmint_tpu.store.experiment import ExperimentGrid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """
language: PYTHON
name: "objective"
variable { name: "x" type: FLOAT size: 2 min: 0 max: 1 }
"""

OBJECTIVE = """
import numpy as np
def main(job_id, params):
    x = np.asarray(params["x"], dtype=float)
    return float(((x - 0.5) ** 2).sum())
"""

BROKEN_OBJECTIVE = """
def main(job_id, params):
    raise RuntimeError("boom")
"""


def _setup_expt(tmp_path, objective=OBJECTIVE, config=CONFIG):
    expt = str(tmp_path)
    with open(os.path.join(expt, "config.pb"), "w") as f:
        f.write(config)
    with open(os.path.join(expt, "objective.py"), "w") as f:
        f.write(objective)
    return expt, codec.load_experiment(os.path.join(expt, "config.pb"))


def test_runner_python_complete(tmp_path):
    expt, cfg = _setup_expt(tmp_path)
    grid = loop.open_grid(expt, cfg, grid_size=10, grid_seed=1)
    grid.set_submitted(0)
    job = loop.make_job(grid, cfg, 0)
    assert job_runner(job)
    fresh = ExperimentGrid(expt)
    assert 0 in fresh.get_complete()
    val = fresh.values[0]
    x = fresh.grid[0]
    np.testing.assert_allclose(val, ((x - 0.5) ** 2).sum(), rtol=1e-6)
    assert fresh.durs[0] >= 0
    # job file updated on disk
    back = codec.load_job(codec.job_file_for(expt, 0))
    assert back.status == "complete" and back.value == pytest.approx(val)


def test_runner_marks_broken(tmp_path):
    expt, cfg = _setup_expt(tmp_path, objective=BROKEN_OBJECTIVE)
    grid = loop.open_grid(expt, cfg, grid_size=10, grid_seed=1)
    grid.set_submitted(1)
    job = loop.make_job(grid, cfg, 1)
    assert not job_runner(job)
    assert 1 in ExperimentGrid(expt).get_broken()


def test_runner_shell_language(tmp_path):
    config = CONFIG.replace("PYTHON", "SHELL").replace(
        '"objective"', '"objective.sh"')
    expt, cfg = _setup_expt(tmp_path, config=config)
    script = os.path.join(expt, "objective.sh")
    with open(script, "w") as f:
        f.write("#!/bin/sh\necho evaluating\necho RESULT= 3.25\n")
    os.chmod(script, os.stat(script).st_mode | stat.S_IEXEC)
    grid = loop.open_grid(expt, cfg, grid_size=10, grid_seed=1)
    grid.set_submitted(0)
    job = loop.make_job(grid, cfg, 0)
    assert job_runner(job)
    assert ExperimentGrid(expt).values[0] == pytest.approx(3.25)


def test_fake_driver_dispatch_and_broken_detection(tmp_path):
    expt, cfg = _setup_expt(tmp_path)
    chooser = get_chooser("SequentialChooser", expt)
    driver = get_driver("fake")
    options = Namespace(grid_size=10, grid_seed=1, max_concurrent=2,
                        max_finished_jobs=100)
    assert attempt_dispatch(expt, cfg, chooser, driver, options) == "dispatched"
    assert attempt_dispatch(expt, cfg, chooser, driver, options) == "dispatched"
    # concurrency limit respected
    assert attempt_dispatch(expt, cfg, chooser, driver, options) == "full"
    assert len(driver.submitted) == 2
    # kill one "process": next poll marks its job broken and redispatches
    dead_pid, dead_job = driver.submitted[0]
    driver.kill(dead_pid)
    assert attempt_dispatch(expt, cfg, chooser, driver, options) == "dispatched"
    assert dead_job.id in ExperimentGrid(expt).get_broken()


def test_async_local_driver_end_to_end(tmp_path):
    """Real subprocess runner via the local driver."""
    expt, cfg = _setup_expt(tmp_path)
    chooser = get_chooser("SequentialChooser", expt)
    driver = get_driver("local")
    options = Namespace(grid_size=10, grid_seed=1, max_concurrent=1,
                        max_finished_jobs=100)
    env_fix = {"PYTHONPATH": REPO, **os.environ}
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get(
        "PYTHONPATH", "")
    assert attempt_dispatch(expt, cfg, chooser, driver, options) == "dispatched"
    deadline = time.time() + 30
    while time.time() < deadline:
        if len(ExperimentGrid(expt).get_complete()) == 1:
            break
        time.sleep(0.2)
    fresh = ExperimentGrid(expt)
    assert len(fresh.get_complete()) == 1
    # runner stdout captured
    out = open(codec.job_output_file(expt, int(fresh.get_complete()[0]))).read()
    assert out == "" or "Traceback" not in out


def test_crash_resume(tmp_path):
    """Kill-anytime semantics: a fresh grid view resumes exactly."""
    expt, cfg = _setup_expt(tmp_path)
    grid = loop.open_grid(expt, cfg, grid_size=10, grid_seed=1)
    grid.set_complete(0, 0.5, 1.0)
    grid.set_submitted(1, proc_id=99999)
    del grid  # "crash"
    # restart: same state
    g2 = loop.open_grid(expt, cfg, grid_size=10, grid_seed=1)
    assert 0 in g2.get_complete() and 1 in g2.get_pending()
    # driver says 99999 vanished → broken
    driver = get_driver("fake")
    loop.detect_broken(g2, driver)
    assert 1 in ExperimentGrid(expt).get_broken()


def test_record_best_file(tmp_path):
    expt, cfg = _setup_expt(tmp_path)
    grid = loop.open_grid(expt, cfg, grid_size=10, grid_seed=1)
    grid.set_complete(2, 0.125, 1.0)
    best_val, best_id = loop.record_best(grid)
    assert (best_val, best_id) == (0.125, 2)
    content = open(os.path.join(expt, loop.BEST_FILE)).read()
    assert "0.125" in content and "Job-id: 2" in content


def test_retry_broken_budget(tmp_path):
    expt, cfg = _setup_expt(tmp_path)
    chooser = get_chooser("SequentialChooser", expt)
    driver = get_driver("fake")
    options = Namespace(grid_size=10, grid_seed=1, max_concurrent=1,
                        max_finished_jobs=100, retry_broken=2)
    assert attempt_dispatch(expt, cfg, chooser, driver, options) == "dispatched"
    pid, job = driver.submitted[0]
    for round_num in (1, 2):
        driver.kill(pid)
        # next poll: job marked broken then requeued, and redispatched
        assert attempt_dispatch(expt, cfg, chooser, driver, options) == \
            "dispatched"
        grid = ExperimentGrid(expt)
        assert job.id not in grid.get_broken()
        assert int(grid.retries[job.id]) == round_num
        pid, _ = driver.submitted[-1]
    # budget exhausted: third death stays broken
    driver.kill(pid)
    attempt_dispatch(expt, cfg, chooser, driver, options)
    assert job.id in ExperimentGrid(expt).get_broken()


def test_persistent_compile_cache_setup(tmp_path, monkeypatch):
    """enable_persistent_compile_cache points jax's persistent cache at
    <expt_dir>/.jax_cache, defers to a user-set env var, and is
    idempotent (a prior config wins)."""
    import jax

    from spearmint_tpu.harness import loop as loop_mod

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        path = loop_mod.enable_persistent_compile_cache(str(tmp_path))
        assert path == str(tmp_path / ".jax_cache")
        assert (tmp_path / ".jax_cache").is_dir()
        assert jax.config.jax_compilation_cache_dir == path
        # second call: prior config wins (no clobber)
        assert loop_mod.enable_persistent_compile_cache("/elsewhere") is None

        # user env var wins over ours
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/userchoice")
        assert loop_mod.enable_persistent_compile_cache(str(tmp_path)) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
