"""Pallas TPU kernels for the GP hot path.

The framework's on-chip native tier (SURVEY.md §2a): where the reference
leans on NumPy-BLAS/LAPACK, the rebuild's hottest op — Matérn-5/2
kernel-matrix assembly, executed inside every slice-sampling likelihood
evaluation and every EI sweep — has a fused Pallas implementation:

  * inputs are pre-scaled by the ARD length scales and zero-padded to
    128 lanes, so the pairwise squared distances come off the MXU as one
    [TM,128]·[128,TN] contraction per tile;
  * the Matérn transform (sqrt, exp, polynomial) runs on the VPU in the
    same kernel, so the distance matrix never round-trips HBM;
  * amp2 scaling is fused via SMEM scalar prefetch.

Numerics match the jnp reference path to f32 roundoff (tests compare
exactly).  Shapes must tile by (128, 128); callers fall back to the jnp
path otherwise (spearmint_tpu.core.kernels.matern52).  Off-TPU the
kernel runs in interpreter mode so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_M = 128
TILE_N = 128
SQRT5 = math.sqrt(5.0)


def _matern52_kernel(amp2_ref, a_ref, b_ref, out_ref):
    a = a_ref[:]                       # [TM, LANE] scaled+padded points
    b = b_ref[:]                       # [TN, LANE]
    a2 = jnp.sum(a * a, axis=1, keepdims=True)          # [TM, 1]
    b2 = jnp.sum(b * b, axis=1, keepdims=True)          # [TN, 1]
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [TM, TN] (MXU)
    d2 = jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)
    pos = d2 > 0.0
    r = jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)
    k = (1.0 + SQRT5 * r + (5.0 / 3.0) * d2) * jnp.exp(-SQRT5 * r)
    out_ref[:] = amp2_ref[0] * k


@functools.partial(jax.jit, static_argnames=("interpret",))
def _matern52_call(a, b, amp2, interpret):
    n, m = a.shape[0], b.shape[0]
    grid = (n // TILE_M, m // TILE_N)
    return pl.pallas_call(
        _matern52_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_M, LANE), lambda i, j, amp2: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, LANE), lambda i, j, amp2: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j, amp2: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * LANE + 8 * n * m,
            bytes_accessed=4 * (n * LANE + m * LANE + n * m),
            transcendentals=2 * n * m,
        ),
    )(amp2, a, b)


def pallas_supported(x1: jnp.ndarray, x2: jnp.ndarray) -> bool:
    return (
        x1.ndim == 2 and x2.ndim == 2
        and x1.shape[0] % TILE_M == 0
        and x2.shape[0] % TILE_N == 0
        and x1.shape[1] <= LANE
    )


def matern52_pallas(x1: jnp.ndarray, x2: jnp.ndarray, ls: jnp.ndarray,
                    amp2=1.0) -> jnp.ndarray:
    """amp2 · Matérn-5/2(x1/ls, x2/ls) via the fused Pallas kernel.

    Falls back to the jnp path when shapes don't tile.
    """
    from spearmint_tpu.core.kernels import matern52

    if not pallas_supported(x1, x2):
        return jnp.asarray(amp2, x1.dtype) * matern52(x1, x2, ls)
    d = x1.shape[1]
    a = jnp.zeros((x1.shape[0], LANE), jnp.float32).at[:, :d].set(x1 / ls)
    b = jnp.zeros((x2.shape[0], LANE), jnp.float32).at[:, :d].set(x2 / ls)
    amp = jnp.asarray([amp2], jnp.float32).reshape(1)
    interpret = jax.default_backend() != "tpu"
    return _matern52_call(a, b, amp, interpret)


def matern52_pallas_kernelfn(x1, x2, ls):
    """KERNELS-registry-compatible wrapper (unit amplitude)."""
    return matern52_pallas(x1, x2, ls, amp2=1.0)
