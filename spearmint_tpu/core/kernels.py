"""Covariance kernels: Matérn-5/2 / Matérn-3/2 / squared-exponential, ARD.

Behavioral parity target: the reference GP kernel library
(``spearmint/spearmint/gp.py`` — ``dist2`` ≈L20, ``Matern52`` ≈L60,
``grad_Matern52``; reconstructed per SURVEY.md §2 #6).  Unlike the
reference, gradients of the kernel w.r.t. inputs are obtained with
``jax.grad`` through these functions rather than hand-derived chain rules,
so there is no ``grad_*`` twin for each kernel.

TPU notes
---------
* ``ard_sqdist`` has two code paths: a direct-difference path (numerically
  exact, O(n·m·D) intermediate that XLA fuses) used for the small D typical
  of BO, and a matmul path (MXU-friendly ‖a‖²+‖b‖²−2a·bᵀ expansion) for
  large D.  The crossover is controlled by ``_MATMUL_MIN_DIM``.
* All kernels use a "safe sqrt" so that jax.grad at r²=0 returns 0 (the
  true gradient of a Matérn kernel at coincident points) instead of NaN.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Above this input dimensionality, use the matmul (MXU) expansion for
# pairwise squared distances; below it, the direct-difference reduction is
# both exact and fast for BO-sized D.
_MATMUL_MIN_DIM = 32


def ard_sqdist(x1: jnp.ndarray, x2: jnp.ndarray, ls: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances of length-scaled points.

    Args:
      x1: (n, D) points.
      x2: (m, D) points.
      ls: (D,) ARD length scales (reference ``dist2(ls, x1, x2)``).

    Returns:
      (n, m) matrix of sum_d ((x1[i,d]-x2[j,d])/ls[d])**2.
    """
    a = x1 / ls
    b = x2 / ls
    if x1.shape[-1] >= _MATMUL_MIN_DIM:
        a2 = jnp.sum(a * a, axis=-1)
        b2 = jnp.sum(b * b, axis=-1)
        d2 = a2[:, None] + b2[None, :] - 2.0 * a @ b.T
    else:
        # Unrolled per-dimension accumulation of (n, m) terms.  The
        # one-shot broadcast form ((a[:,None,:]-b[None,:,:])**2).sum(-1)
        # materializes an (n, m, D) temporary that XLA does not always
        # fuse away — measured 29 ms for 10×5120² at D=2 on v5e, ~20×
        # the bandwidth floor of the (n, m) output alone.  Same values,
        # same left-to-right summation order.
        d2 = jnp.zeros(a.shape[:-1] + b.shape[:-1], a.dtype)
        for d in range(x1.shape[-1]):
            diff = a[..., d][:, None] - b[..., d][None, :]
            d2 = d2 + diff * diff
    return jnp.maximum(d2, 0.0)


def _safe_sqrt(r2: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a zero (not NaN) gradient at r2 == 0."""
    positive = r2 > 0.0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, r2, 1.0)), 0.0)


def matern52(x1: jnp.ndarray, x2: jnp.ndarray, ls: jnp.ndarray) -> jnp.ndarray:
    """Matérn-5/2 ARD kernel (unit amplitude).

    k(r) = (1 + √5 r + 5/3 r²) exp(−√5 r), r² = ard_sqdist.
    Parity: reference ``gp.Matern52``.
    """
    r2 = ard_sqdist(x1, x2, ls)
    r = _safe_sqrt(r2)
    sqrt5 = math.sqrt(5.0)
    return (1.0 + sqrt5 * r + (5.0 / 3.0) * r2) * jnp.exp(-sqrt5 * r)


def matern32(x1: jnp.ndarray, x2: jnp.ndarray, ls: jnp.ndarray) -> jnp.ndarray:
    """Matérn-3/2 ARD kernel (unit amplitude)."""
    r = _safe_sqrt(ard_sqdist(x1, x2, ls))
    sqrt3 = math.sqrt(3.0)
    return (1.0 + sqrt3 * r) * jnp.exp(-sqrt3 * r)


def squared_exp(x1: jnp.ndarray, x2: jnp.ndarray, ls: jnp.ndarray) -> jnp.ndarray:
    """Squared-exponential (RBF) ARD kernel (unit amplitude)."""
    return jnp.exp(-0.5 * ard_sqdist(x1, x2, ls))


# Registry keyed by the names the reference accepts via chooser args
# (``covar=Matern52`` etc.).
KERNELS = {
    "Matern52": matern52,
    "Matern32": matern32,
    "SquaredExp": squared_exp,
    "ARDSE": squared_exp,
    "SE": squared_exp,
}


def get_kernel(name: str):
    # (A fused Pallas kernel-matrix op ``Matern52Pallas`` shipped in
    # r1-r3 and was retired in r4: the unrolled small-D assembly below
    # closed the gap it was built for, and it measured 3.26 s vs 2.16 s
    # at the flagship config — see docs/PROFILE_r4.md.)
    try:
        return KERNELS[name]
    except KeyError:
        raise ValueError(
            f"unknown kernel {name!r}; available: {sorted(KERNELS)}"
        ) from None
