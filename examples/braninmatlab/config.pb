# Branin via a MATLAB objective (reference matlab example parity).
# Requires a MATLAB installation on PATH; the runner's matlab launcher
# raises a clear error in images without one (harness/runner.py).
language: MATLAB
name: "branin"

variable {
 name: "X"
 type: FLOAT
 size: 2
 min: 0
 max: 1
}
