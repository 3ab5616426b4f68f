"""The bench suite must be CI-smokeable: `--all --quick --skip-baseline`
runs every BASELINE preset at tiny shapes and writes a complete
benchmarks/results.json with no error entries (VERDICT r2 missing #3).
"""

import json
import sys


def test_bench_all_quick_writes_complete_results(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.chdir(tmp_path)
    rc = bench.main(["--all", "--quick", "--skip-baseline"])
    assert rc == 0

    with open(tmp_path / "benchmarks" / "results.json") as f:
        records = json.load(f)

    # flagship + every preset, none failed
    assert len(records) == 1 + len(bench.PRESETS), [r["metric"] for r in records]
    errors = [r for r in records if "error" in r]
    assert not errors, errors
    for r in records:
        assert r["value"] > 0, r
        assert r["sweeps_per_s"] > 0, r
