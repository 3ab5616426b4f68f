"""SGE driver exercised against fake qsub/qstat binaries.

The reference's ``driver/sge.py`` is its entire distributed backend
(SURVEY.md §2 #11); no grid engine exists in this image, so these tests
drop executable stand-ins on PATH — the same fake-backend strategy the
local driver gets via subprocess — covering submission command
composition, -terse job-id parsing, failure surfacing, and qstat
liveness."""

import os
import stat

import pytest

from spearmint_tpu.store import codec


def _fake_bin(tmp_path, name, script):
    p = tmp_path / "bin" / name
    p.parent.mkdir(exist_ok=True)
    p.write_text("#!/bin/sh\n" + script)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return p


@pytest.fixture
def fake_sge(tmp_path, monkeypatch):
    # qsub: record argv, print a -terse style job id
    _fake_bin(tmp_path, "qsub",
              'echo "$@" > "$(dirname "$0")/qsub_args"\necho 4242\n')
    # qstat: alive only for job id 4242
    _fake_bin(tmp_path, "qstat",
              '[ "$2" = "4242" ] && exit 0\n'
              'echo "job not found" >&2\nexit 1\n')
    monkeypatch.setenv("PATH", f"{tmp_path}/bin:{os.environ['PATH']}")
    return tmp_path


def _job(tmp_path):
    expt = tmp_path / "expt"
    (expt / "jobs").mkdir(parents=True)
    (expt / "output").mkdir()
    return codec.Job(id=7, expt_dir=str(expt), name="branin",
                     language="PYTHON", params={"X": [0.1, 0.2]})


def test_init_raises_clearly_without_grid_engine(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty PATH: no qsub
    from spearmint_tpu.harness.drivers import sge

    with pytest.raises(RuntimeError, match="qsub/qstat"):
        sge.init()


def test_submit_parses_terse_job_id_and_composes_command(fake_sge):
    from spearmint_tpu.harness.drivers import sge

    drv = sge.init()
    job = _job(fake_sge)
    assert drv.submit_job(job) == 4242
    argv = (fake_sge / "bin" / "qsub_args").read_text()
    assert "-terse" in argv
    assert "harness.runner" in argv
    assert codec.job_file_for(job.expt_dir, job.id) in argv
    assert codec.job_output_file(job.expt_dir, job.id) in argv


def test_liveness_via_qstat(fake_sge):
    from spearmint_tpu.harness.drivers import sge

    drv = sge.init()
    assert drv.is_alive(4242) is True
    assert drv.is_alive(9999) is False


def test_submit_failure_surfaces_stderr(fake_sge):
    _fake_bin(fake_sge, "qsub", 'echo "queue rejected" >&2\nexit 1\n')
    from spearmint_tpu.harness.drivers import sge

    drv = sge.init()
    with pytest.raises(RuntimeError, match="qsub failed"):
        drv.submit_job(_job(fake_sge))
