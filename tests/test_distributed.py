"""Two-process jax.distributed bootstrap (SURVEY.md §4 item 3b).

engine/distributed.initialize is exercised for real: two OS processes,
one CPU device each, form a global 2-device mesh (collectives over
gloo); both run the identical sharded suggestion and must agree exactly
— the multi-host contract the pod deployment relies on (no leader
broadcast; SURVEY.md hard part #4).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_dist_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_identical_suggestion():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # exactly 1 local CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO, text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = [line for out in outs for line in out.splitlines()
               if line.startswith("RESULT ")]
    assert len(results) == 2, outs
    assert results[0] == results[1], results
