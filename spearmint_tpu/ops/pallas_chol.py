"""Blocked Cholesky factorization with a Pallas TPU trailing update.

SURVEY.md hard part #5: the MCMC hot loop is Cholesky-bound (measured
~66 ms for a [10, 6144, 6144] f32 batch via XLA ≈ 11.7 TFLOP/s on v5e;
this kernel: ~49 ms ≈ 15.6 TFLOP/s, 1.34×).  Right-looking blocked
factorization:

  for each column panel k (width B):
    1. PANEL — O(n²B) FLOPs on XLA+MXU building blocks: batched
       Cholesky of the [B, B] diagonal block, explicit L₁₁⁻¹ via a
       [B, B] triangular solve, then L₂₁ = A₂₁ · L₁₁⁻ᵀ as one batched
       MXU GEMM.  (A hand-written Pallas panel was tried and measured
       6× slower end-to-end: its per-column masked sweep over the
       whole [N, B] strip is VPU-serial.  Explicit inverse is what
       XLA's own TPU trsm does internally; GP matrices carry jitter so
       conditioning is benign.)
    2. TRAILING — the O(n³/3) FLOPs: A₂₂ −= L₂₁ L₂₁ᵀ as a Pallas call
       whose grid is the *linearized lower triangle* of [B, B] tiles
       (t → (i ≥ j)), with the full matrix aliased input→output so the
       update is in place.  Versus a rectangular grid + slice-out /
       slice-in orchestration this saves ~4× HBM traffic: no trailing
       copies, and upper tiles are never even streamed through VMEM.

Batch (chains) is a leading grid dimension.  N must divide by B; padded
matrices from core/linalg (identity rows) factor exactly.  Off-TPU the
kernel runs in interpreter mode, so CPU tests exercise the same code.

The k-loop is static (one pallas_call per panel, all inside one jit).

INTEGRATION STATUS (measured, v5e, twice): isolated and under
vmap/fori/while contexts this kernel holds 1.27–1.34× over XLA's
cholesky at [10, 6144, 6144] f32.  Enabled inside the full suggest
step (SPEARMINT_TPU_PALLAS_CHOL=1) it *regresses* end-to-end:
r2 measured 17.9 s vs 5.6 s with >25-minute sweep compiles (every
logprob call site inlined nb pallas_calls); r3's single-call-site
slice loop + lp carry cut the sweep to 2 chol sites and the compile
problem disappeared (full bench run in ~3 min) — but the runtime
regression remains: 9.97 s vs 2.16 s flagship.  The aliased in-place
trailing update forbids the producer/consumer fusions XLA applies
around its own cholesky (per-eval assembly, masking, solves all fuse
into XLA's chol pipeline; the pallas path materializes each), and the
10-panel Python loop serializes dynamic_update_slice round-trips per
evaluation.  The engine default stays XLA; this kernel remains
correct, tested, and available for few-call-site, large-N batch
contexts (e.g. one-shot factorization phases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Preference order, microbenched on v5e at [10, 6144, 6144] f32:
# B=768 → 15.6 TFLOP/s (1.34× XLA), B=1024 → 15.1, B=512 → 14.9,
# XLA cholesky → 11.7.  Quarter-midpoint buckets (core/linalg.py) are
# all multiples of 128 but not all of 512: buckets ≥ 2048 plus 1024/1536
# tile at 512 or 768 (5120 = 10·512, 7168 = 14·512), while 1280 and 1792
# divide neither and fall to the slower 256 block — pick the fastest
# block that divides N.
BLOCK_PREFERENCE = (768, 512, 256)


def _tri_decode(t):
    """Map linear index t to (i, j) in the lower triangle, row-major:
    t = i(i+1)/2 + j with j ≤ i.  f32 sqrt seed + exact int fixup."""
    i = ((jnp.sqrt(8.0 * t.astype(jnp.float32) + 1.0) - 1.0) / 2.0).astype(
        jnp.int32
    )
    i = jnp.where((i + 1) * (i + 2) // 2 <= t, i + 1, i)
    i = jnp.where(i * (i + 1) // 2 > t, i - 1, i)
    j = t - i * (i + 1) // 2
    return i, j


def _trailing_kernel(a_ref, li_ref, lj_ref, out_ref):
    """One lower-triangle [B, B] tile of A₂₂ −= L₂₁ L₂₁ᵀ."""
    out_ref[0] = a_ref[0] - jax.lax.dot_general(
        li_ref[0], lj_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _trailing_update(a, l21, k, block, interpret):
    """In-place A₂₂ −= L₂₁ L₂₁ᵀ for the trailing square at panel k."""
    k_batch, n = a.shape[0], a.shape[1]
    m = l21.shape[1] // block
    ntri = m * (m + 1) // 2
    off_b = k + 1  # trailing origin, in tiles

    def a_map(b, t):
        i, j = _tri_decode(t)
        return b, off_b + i, off_b + j

    def li_map(b, t):
        i, _ = _tri_decode(t)
        return b, i, 0

    def lj_map(b, t):
        _, j = _tri_decode(t)
        return b, j, 0

    return pl.pallas_call(
        _trailing_kernel,
        grid=(k_batch, ntri),
        in_specs=[
            pl.BlockSpec((1, block, block), a_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), li_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), lj_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, block), a_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
        # 4 live [B, B] f32 blocks, double-buffered: 32 MB at B=1024 —
        # past the 16 MB default scoped-vmem budget (v5e has 128 MB).
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_batch * ntri * block**3,
            bytes_accessed=4 * k_batch * ntri * 4 * block**2,
            transcendentals=0,
        ),
    )(a, l21, l21)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _cholesky_blocked(a, block, interpret):
    k_batch, n = a.shape[0], a.shape[1]
    nb = n // block
    eye = jnp.eye(block, dtype=a.dtype)

    for k in range(nb):
        row0 = k * block
        diag = jax.lax.dynamic_slice(
            a, (0, row0, row0), (k_batch, block, block))
        l11 = jnp.linalg.cholesky(diag)
        a = jax.lax.dynamic_update_slice(a, l11, (0, row0, row0))

        m = nb - (k + 1)  # trailing tiles per side
        if m == 0:
            continue
        off = (k + 1) * block
        linv = jax.lax.linalg.triangular_solve(
            l11, jnp.broadcast_to(eye, l11.shape),
            left_side=True, lower=True)
        a21 = jax.lax.dynamic_slice(
            a, (0, off, row0), (k_batch, m * block, block))
        l21 = jnp.einsum("bmc,bkc->bmk", a21, linv,
                         preferred_element_type=a.dtype)
        a = jax.lax.dynamic_update_slice(a, l21, (0, off, row0))
        a = _trailing_update(a, l21, k, block, interpret)

    # zero the upper triangle (the sweep leaves stale values there)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where((ridx >= cidx)[None], a, 0.0)


def cholesky_pallas(a: jnp.ndarray, block: int | None = None) -> jnp.ndarray:
    """Lower Cholesky of a batch of PSD matrices ([K, N, N] or [N, N]).

    ``block=None`` picks the fastest block size that tiles N (see
    BLOCK_PREFERENCE).  Falls back to ``jnp.linalg.cholesky`` when no
    block tiles N, or N < 2·block (where XLA's kernel is already fine).
    """
    single = a.ndim == 2
    ab = a[None] if single else a
    n = ab.shape[-1]
    candidates = (block,) if block is not None else BLOCK_PREFERENCE
    block = next(
        (b for b in candidates if n % b == 0 and n >= 2 * b), None)
    if block is None:
        out = jnp.linalg.cholesky(ab)
    else:
        interpret = jax.default_backend() != "tpu"
        out = _cholesky_blocked(ab, block, interpret)
    return out[0] if single else out
