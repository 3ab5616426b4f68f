"""Blocked Cholesky factorization as Pallas TPU kernels.

SURVEY.md hard part #5: the MCMC hot loop is Cholesky-bound (measured
97 ms for a [10, 6144, 6144] f32 batch via XLA ≈ 8 TFLOP/s).  This is a
classic right-looking blocked factorization:

  for each column panel k (width B):
    1. PANEL: factor the diagonal block and solve the sub-diagonal
       panel in one fused kernel — a column-by-column sweep over the
       whole [N, B] strip held in VMEM (each column update is one
       masked rank-1 VPU operation over the strip);
    2. TRAILING: A₂₂ −= L₂₁ L₂₁ᵀ as a grid of [B, B] MXU tiles over the
       lower-triangular trailing region (upper tiles pass through).

Batch (chains) is a leading grid dimension.  N must divide by B; padded
matrices from core/linalg (identity rows) factor exactly.  Off-TPU the
kernels run in interpreter mode, so CPU tests exercise the same code.

The JAX orchestration keeps the k-loop static (one pallas_call pair per
panel, all inside one jit), with plain dynamic-slice copies instead of
buffer aliasing — the extra strip copies are O(N²B) traffic against the
O(N³/B) of the factorization itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256


def _panel_kernel(strip_ref, out_ref, *, row0: int, block: int):
    """Factor the diagonal block at rows [row0, row0+B) of a [N, B]
    column strip and solve the rows below it, in one sweep.

    Mosaic cannot lower traced-index dynamic_slice, so all per-column
    addressing is one-hot masks / static slices: the column extract is a
    masked row-reduction and the column write a masked select.
    """
    strip = strip_ref[0]  # [N, B]
    n = strip.shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (n, block), 1)
    # All intermediates stay ≥2-D (Mosaic mishandles length-N 1-D
    # vectors: "Invalid relayout ... vector<1x6144xf32>").
    rcol = ridx[:, :1]                      # [N, 1] row indices
    brow = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)  # [1, B]

    def col_step(j, s):
        pr = row0 + j
        ecol = cidx == j                    # [N, B] column-j selector
        colj = jnp.sum(jnp.where(ecol, s, 0.0), axis=1, keepdims=True)
        pivot = jnp.sum(jnp.where(rcol == pr, colj, 0.0))
        # Padded/masked matrices keep pivot > 0 by construction; clamp
        # guards against f32 roundoff driving it slightly negative.
        d = jnp.sqrt(jnp.maximum(pivot, 1e-30))
        newcol = jnp.where(
            rcol < pr, colj, jnp.where(rcol == pr, d, colj / d)
        )                                    # [N, 1]
        s = jnp.where(ecol, newcol, s)
        # rank-1 update of the remaining panel columns (m > j):
        # A[i, m] -= L[i, j] · L[row0+m, j]  for rows i > pr
        # L[row0+m, j] as a [1, B] row: select the diagonal-block rows of
        # newcol and fold them onto the lane axis with a masked matmul
        # (avoids an explicit [B,1]→[1,B] relayout).
        sel = (ridx >= row0) & (ridx < row0 + block) & (
            cidx == (ridx - row0))           # [N, B] permutation mask
        diag_row = jnp.sum(jnp.where(sel, newcol, 0.0), axis=0,
                           keepdims=True)    # [1, B]
        below = jnp.where(rcol > pr, newcol, 0.0)   # [N, 1]
        update = below * diag_row                    # [N, B]
        s = s - jnp.where(cidx > j, update, 0.0)
        return s

    strip = lax.fori_loop(0, block, col_step, strip)
    out_ref[0] = strip


def _trailing_kernel(a_ref, li_ref, lj_ref, out_ref):
    """One [B, B] tile of A₂₂ −= L₂₁ L₂₁ᵀ (lower tiles only)."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    tile = a_ref[0]

    @pl.when(i >= j)
    def _():
        out_ref[0] = tile - jax.lax.dot_general(
            li_ref[0], lj_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i < j)
    def _():
        out_ref[0] = tile


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _cholesky_blocked(a, block, interpret):
    k_batch, n = a.shape[0], a.shape[1]
    nb = n // block

    for k in range(nb):
        row0 = k * block
        strip = jax.lax.dynamic_slice(
            a, (0, 0, row0), (k_batch, n, block)
        )
        strip = pl.pallas_call(
            functools.partial(_panel_kernel, row0=row0, block=block),
            grid=(k_batch,),
            in_specs=[
                pl.BlockSpec((1, n, block), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, block), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k_batch, n, block), a.dtype),
            interpret=interpret,
        )(strip)
        a = jax.lax.dynamic_update_slice(a, strip, (0, 0, row0))

        m = nb - (k + 1)  # trailing tiles per side
        if m == 0:
            continue
        off = (k + 1) * block
        trailing = jax.lax.dynamic_slice(
            a, (0, off, off), (k_batch, m * block, m * block)
        )
        l21 = jax.lax.dynamic_slice(
            strip, (0, off, 0), (k_batch, m * block, block)
        )
        trailing = pl.pallas_call(
            _trailing_kernel,
            grid=(k_batch, m, m),
            in_specs=[
                pl.BlockSpec((1, block, block), lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block, block), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block, block), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block, block),
                                   lambda b, i, j: (b, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (k_batch, m * block, m * block), a.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * k_batch * (m * block) ** 2 * block,
                bytes_accessed=4 * k_batch * (
                    2 * (m * block) ** 2 + 2 * m * block * block),
                transcendentals=0,
            ),
        )(trailing, l21, l21)
        a = jax.lax.dynamic_update_slice(a, trailing, (0, off, off))

    # zero the upper triangle (the sweep leaves original A there)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where((ridx >= cidx)[None], a, 0.0)


def cholesky_pallas(a: jnp.ndarray, block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Lower Cholesky of a batch of PSD matrices ([K, N, N] or [N, N]).

    Falls back to ``jnp.linalg.cholesky`` when N doesn't tile by
    ``block`` (or N < 2·block, where XLA's kernel is already fine).
    """
    single = a.ndim == 2
    ab = a[None] if single else a
    n = ab.shape[-1]
    if n % block != 0 or n < 2 * block:
        out = jnp.linalg.cholesky(ab)
    else:
        interpret = jax.default_backend() != "tpu"
        out = _cholesky_blocked(ab, block, interpret)
    return out[0] if single else out
