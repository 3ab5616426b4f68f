"""Regenerate spearmint_tpu/golden/branin_trajectory.json.

Run after any intentional change to the golden math or when the
NumPy/SciPy/BLAS environment changes (see golden/trajectory.py).
"""

import json
import os
import time

from spearmint_tpu.golden.trajectory import run_trajectory

t0 = time.perf_counter()
traj = run_trajectory()
out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "spearmint_tpu", "golden", "branin_trajectory.json")
with open(out, "w") as f:
    json.dump(traj, f, indent=1)
best = traj["steps"][-1]["best"]
print(f"wrote {os.path.normpath(out)}: {len(traj['steps'])} steps, "
      f"best={best:.6f} (f*=0.397887), {time.perf_counter()-t0:.1f}s")
