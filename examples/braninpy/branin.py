"""Branin-Hoo test objective (reference examples/braninpy/branin.py).

Global minimum f* = 0.397887 at (-pi, 12.275), (pi, 2.275),
(9.42478, 2.475).  The canonical end-to-end smoke test: run the harness
and watch the best value approach 0.398 (SURVEY.md §4).

The config maps X in [0,1]^2; we rescale to the Branin domain
x1 in [-5, 10], x2 in [0, 15].
"""

import math
import sys


def branin(x1, x2):
    a = 1.0
    b = 5.1 / (4 * math.pi**2)
    c = 5 / math.pi
    r = 6.0
    s = 10.0
    t = 1 / (8 * math.pi)
    return a * (x2 - b * x1**2 + c * x1 - r) ** 2 + (
        s * (1 - t) * math.cos(x1) + s
    )


def main(job_id, params):
    u = params["X"]
    x1 = -5.0 + 15.0 * float(u[0])
    x2 = 15.0 * float(u[1])
    value = branin(x1, x2)
    print(f"branin({x1:.4f}, {x2:.4f}) = {value:.6f}")
    return value


if __name__ == "__main__":
    print(main(0, {"X": [float(sys.argv[1]), float(sys.argv[2])]}))
