"""Hartmann-6 test objective: global minimum f* = -3.32237 at
(0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573)."""

import numpy as np

A = np.array([
    [10.0, 3.0, 17.0, 3.5, 1.7, 8.0],
    [0.05, 10.0, 17.0, 0.1, 8.0, 14.0],
    [3.0, 3.5, 1.7, 10.0, 17.0, 8.0],
    [17.0, 8.0, 0.05, 10.0, 0.1, 14.0],
])
ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
P = 1e-4 * np.array([
    [1312, 1696, 5569, 124, 8283, 5886],
    [2329, 4135, 8307, 3736, 1004, 9991],
    [2348, 1451, 3522, 2883, 3047, 6650],
    [4047, 8828, 8732, 5743, 1091, 381],
])


def hartmann6(x):
    x = np.asarray(x, dtype=float)
    inner = np.sum(A * (x[None, :] - P) ** 2, axis=1)
    return -float(np.sum(ALPHA * np.exp(-inner)))


def main(job_id, params):
    value = hartmann6(params["X"])
    print(f"hartmann6 = {value:.6f}")
    return value
