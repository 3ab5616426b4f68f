"""Event log + web status endpoints."""

import json
import urllib.request

import numpy as np

from spearmint_tpu.store import codec
from spearmint_tpu.store.experiment import ExperimentGrid
from spearmint_tpu.utils.events import EventLog


def test_event_log_roundtrip(tmp_path):
    log = EventLog(str(tmp_path))
    log.emit("suggest", latency_s=0.5, n_obs=10)
    log.emit("best", value=np.float32(1.5), job=np.int64(3))
    events = log.read()
    assert [e["kind"] for e in events] == ["suggest", "best"]
    assert events[0]["latency_s"] == 0.5
    assert events[1]["value"] == 1.5  # numpy scalars serialized
    # append-only: a second logger appends
    EventLog(str(tmp_path)).emit("x", a=1)
    assert len(log.read()) == 3


def test_web_status_endpoints(tmp_path):
    from spearmint_tpu.harness.status import serve_status

    cfg = codec.parse_text_config(
        'language: PYTHON name: "e" '
        'variable { name: "x" type: FLOAT size: 2 min: 0 max: 1 }'
    )
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=10)
    grid.set_complete(1, 0.75, 2.0)
    server = serve_status(str(tmp_path), 0)  # ephemeral port
    port = server.server_address[1]
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/json", timeout=5).read()
        snap = json.loads(body)
        assert snap["counts"]["complete"] == 1
        assert snap["best_value"] == 0.75
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read().decode()
        assert "spearmint-tpu" in html and "0.75" in html
    finally:
        server.shutdown()


def test_watch_snapshot_and_render(tmp_path, capsys):
    from spearmint_tpu.harness import watch

    cfg = codec.parse_text_config(
        'language: PYTHON name: "e" '
        'variable { name: "x" type: FLOAT size: 2 min: 0 max: 1 }'
    )
    grid = ExperimentGrid(str(tmp_path), cfg.variables, grid_size=10)
    grid.set_complete(1, 0.75, 2.0)
    log = EventLog(str(tmp_path))
    log.emit("dispatch", job=1, proc=123)
    log.emit("suggest", latency_s=0.5, n_obs=10)
    log.emit("suggest", latency_s=0.25, n_obs=11)
    log.emit("complete", job=1, value=0.75, duration_s=2.0)
    log.emit("best", value=0.75, job=1, n_complete=1)

    snap = watch.snapshot(str(tmp_path))
    assert snap["counts"]["complete"] == 1
    assert snap["best_value"] == 0.75
    assert snap["latencies"] == [0.5, 0.25]

    out = watch.render(snap)
    assert "best: 0.75" in out
    assert "median 0.375s" in out
    assert "dispatch" in out and "complete" in out

    # --once CLI path
    assert watch.main([str(tmp_path), "--once"]) == 0
    printed = capsys.readouterr().out
    assert "spearmint-tpu experiment" in printed


def test_sparkline_shapes():
    from spearmint_tpu.harness.watch import sparkline

    assert sparkline([]) == ""
    assert sparkline([1.0]) == "▁"
    s = sparkline([0, 1, 2, 3], width=4)
    assert len(s) == 4 and s[0] == "▁" and s[-1] == "█"
    assert len(sparkline(list(range(100)), width=10)) == 10


def test_all_gp_choosers_emit_suggest_events(tmp_path):
    """The north-star metric (suggestion latency) must be visible for all
    three GP choosers, not just the flagship."""
    from spearmint_tpu.choosers import get_chooser

    rng = np.random.RandomState(0)
    args = "mcmc_iters=2,chains=2,burnin=5,grid_subset=2,lbfgs_iters=5"
    grid = rng.rand(30, 2)
    complete = np.arange(8)
    candidates = np.arange(8, 30)
    durs = np.full(30, np.nan)
    durs[complete] = 1.0 + grid[complete, 0]

    for name in ("GPEIOptChooser", "GPEIperSecChooser",
                 "GPConstrainedEIChooser"):
        expt = str(tmp_path / name)
        import os
        os.makedirs(expt, exist_ok=True)
        values = np.full(30, np.nan)
        values[complete] = rng.randn(8)
        if name == "GPConstrainedEIChooser":
            values[complete[:2]] = np.nan  # some violations
        chooser = get_chooser(name, expt, args)
        chooser.next(grid, values, durs, candidates, [], complete)
        events = EventLog(expt).read()
        suggests = [e for e in events if e["kind"] == "suggest"]
        assert suggests, f"{name} emitted no suggest event"
        ev = suggests[-1]
        assert ev["chooser"] == name
        assert ev["latency_s"] > 0
        assert ev["n_obs"] > 0 and ev["n_cand"] == 22
