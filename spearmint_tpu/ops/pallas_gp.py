"""Fused GP log-marginal factorization — one Pallas kernel per evaluation.

The slice-sampling hot loop evaluates, per proposal, the GP log-marginal

    lp = -Σ log diag(L) - ½‖L⁻¹r‖²,   L = chol(K)

(core/likelihood.py; reference ``GPEIOptChooser.logprob`` per SURVEY.md
§3.2).  Round-3 profiling (docs/PROFILE_r3.md) measured the XLA pipeline
for this at ~93 ms per batched-10 evaluation at N=5120 on v5e: a 63 ms
batched Cholesky running at 6.6 TF/s — half of it sequential panel
latency XLA cannot hide — plus a ~21 ms latency-bound single-RHS
triangular solve.  The r2/r3 per-panel hybrid (ops/pallas_chol.py)
showed the MXU can hold 15.6 TF/s on the trailing update but lost it
all to per-panel orchestration (aliased copies, dynamic_update_slice
round trips, broken fusions).

This kernel does the ENTIRE evaluation in ONE ``pallas_call``:

  * right-looking blocked Cholesky over B=512 panels, the O(N³/3)
    trailing update streamed through VMEM with double-buffered manual
    DMA (grid is sequential over panels; the matrix lives in HBM as an
    input→output aliased workspace that is destroyed in place);
  * the diagonal-block factorization in VMEM with a two-level scheme:
    serial base-block columns (the irreducible N-column dependency
    chain, paid on [K, b, b] sub-tiles where it costs ~0.3 µs/column
    instead of XLA's per-panel kernel-launch latency) producing the
    base factor AND its inverse in the same loop (elementary-factor
    accumulation: L = (Π_j E_j)·D ⇒ L⁻¹ = D⁻¹·Π_j E_j⁻¹ applied to I);
  * the RHS solved DURING factorization (w ← L⁻¹r interleaved with the
    panel sweep), so the latency-bound standalone trisolve disappears;
  * only the two scalars the sampler needs — Σ log diag(L) and ‖w‖² —
    leave the chip.

A failed factorization (non-PSD proposal) yields NaN through the sqrt,
which propagates to both outputs; callers map NaN → −inf exactly as the
XLA path does.  Padded identity rows/cols (linalg.mask_psd_matrix)
factor to unit diagonal entries and zero residuals, contributing 0 to
both outputs, so masking semantics are unchanged.

Numerics: all MXU contractions run at ``Precision.HIGHEST`` (f32
accumulation, 6-pass bf16 decomposition — same class XLA's own
Cholesky uses); agreement with the XLA path is ~1e-5 relative on the
log-marginal at N=5120 (tested).

Off-TPU the kernel runs in the Pallas interpreter, so CPU tests
exercise the same code at small N; the production dispatch
(linalg.chol_logdet_q) only routes to it on real TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Panel width of the outer blocked factorization.  512 balances DMA
# traffic (total ≈ 2·4·K·N³/(3B) bytes; ~7 GB at N=5120, K=10 → ~9 ms
# at v5e HBM bandwidth, hidden under the MXU trailing update) against
# VMEM residency (six double-buffered [K, B, B] tiles = 60 MB at K=10).
BLOCK = 512
# Base width of the serial column sweep inside a diagonal block.  The
# N-column dependency chain is irreducible; b only sets the per-column
# VPU cost ([K, b, b] rank-1 updates) vs the amount of MXU glue.
SUB = 64
# Largest chain batch factored in one kernel call (VMEM: 6·K·B²·4 bytes
# of tile slots + 2·K·B² of diag scratch ≈ 8·K MB).  Callers chunk.
MAX_BATCH = 10

# MXU precision for the O(N³) contractions.  "highest" = 6-pass bf16
# (full f32); "high" = 3-pass (~21-bit mantissa products, measured
# ~1e-6 relative on the log-marginal at N=5120 — well inside what slice
# sampling can see).  Static per-trace.
PRECISION = "highest"


def _dot(a, b, contract, batch=((0,), (0,)), prec=None):
    return lax.dot_general(
        a, b, (contract, batch),
        precision=(prec or PRECISION),
        preferred_element_type=jnp.float32,
    )


def _tri_decode(t):
    """Linear index t → (i, j) in the lower triangle, row-major:
    t = i(i+1)/2 + j with j ≤ i.  f32 sqrt seed + exact integer fixup
    (same scheme as ops/pallas_chol)."""
    i = ((jnp.sqrt(8.0 * t.astype(jnp.float32) + 1.0) - 1.0) / 2.0).astype(
        jnp.int32
    )
    i = jnp.where((i + 1) * (i + 2) // 2 <= t, i + 1, i)
    i = jnp.where(i * (i + 1) // 2 > t, i - 1, i)
    j = t - i * (i + 1) // 2
    return i, j


def _factor_base(a):
    """Serial Cholesky of a [K, b, b] SPD value, with simultaneous inverse.

    Returns (L, L⁻¹, d) where d is the [K, b] vector of diagonal pivots.
    The inverse rides the same column loop: with E_j the elementary
    lower-triangular factor whose j-th column is l_j/d_j, L = (Π_j E_j)·D,
    so accumulating W ← E_j⁻¹·W from W=I and scaling rows by 1/d gives
    L⁻¹ with no second substitution pass.
    """
    k_batch, b, _ = a.shape
    dtype = a.dtype
    lanes = lax.broadcasted_iota(jnp.int32, (1, b), 1)          # [1, b]

    def body(j, carry):
        a, lmat, w, dvec = carry
        onev = (lanes == j).astype(dtype)                       # [1, b]
        below = (lanes >= j).astype(dtype)
        # column j of the updated matrix
        col = jnp.sum(a * onev[:, None, :], axis=2)             # [K, b]
        d2 = jnp.sum(col * onev, axis=1)                        # [K]
        inv_d = lax.rsqrt(d2)
        d = d2 * inv_d                                          # sqrt(d2)
        l = col * inv_d[:, None] * below                        # [K, b]
        a = a - l[:, :, None] * l[:, None, :]
        lmat = lmat + l[:, :, None] * onev[:, None, :]
        # inverse accumulation: W ← (I − (l/d − e_j) e_jᵀ) W
        u = l * inv_d[:, None] - onev
        wrow = jnp.sum(w * onev[:, :, None], axis=1)            # [K, b]
        w = w - u[:, :, None] * wrow[:, None, :]
        dvec = dvec + d[:, None] * onev
        return a, lmat, w, dvec

    eye = (lax.broadcasted_iota(jnp.int32, (b, b), 0)
           == lax.broadcasted_iota(jnp.int32, (b, b), 1)).astype(dtype)
    zeros = jnp.zeros_like(a)
    init = (a, zeros, jnp.broadcast_to(eye, a.shape), jnp.zeros((k_batch, b), dtype))
    _, lmat, w, dvec = lax.fori_loop(0, b, body, init)
    inv_dvec = 1.0 / dvec
    linv = w * inv_dvec[:, :, None]
    return lmat, linv, dvec


def _factor_diag(dblk, linv, ldacc, block, sub, prec):
    """Factor the [K, block, block] diagonal block resident in ``dblk``
    (VMEM ref), writing L in place, L⁻¹ into ``linv`` and accumulating
    Σ log d into ``ldacc``.  Two-level: SUB-wide serial bases + MXU glue.
    """
    n_sub = block // sub
    for s in range(n_sub):
        off = s * sub
        a_s = dblk[:, off:off + sub, off:off + sub]
        l_s, li_s, dvec = _factor_base(a_s)
        dblk[:, off:off + sub, off:off + sub] = l_s
        linv[:, off:off + sub, off:off + sub] = li_s
        ldacc[:, :] += jnp.log(dvec)
        rs = block - (off + sub)
        if rs > 0:
            a21 = dblk[:, off + sub:, off:off + sub]            # [K, rs, b]
            l21 = _dot(a21, li_s, ((2,), (2,)), prec=prec)
            dblk[:, off + sub:, off:off + sub] = l21
            a22 = dblk[:, off + sub:, off + sub:]
            dblk[:, off + sub:, off + sub:] = a22 - _dot(
                l21, l21, ((2,), (2,)), prec=prec)
    # assemble the sub-diagonal blocks of L⁻¹ by block forward
    # substitution: X_{t,0:off_t} = −L_tt⁻¹ · L_{t,0:off_t} · X_{0:off_t}
    for t in range(1, n_sub):
        off = t * sub
        lstrip = dblk[:, off:off + sub, 0:off]                  # [K, b, off]
        xtl = linv[:, 0:off, 0:off]
        tmp = _dot(lstrip, xtl, ((2,), (1,)), prec=prec)
        ltt_inv = linv[:, off:off + sub, off:off + sub]
        linv[:, off:off + sub, 0:off] = -_dot(ltt_inv, tmp, ((2,), (1,)), prec=prec)


def _make_kernel(nb, block, sub, prec):
    """Build the kernel body for an N = nb·block matrix."""

    def kernel(a_hbm, r_ref, out_ref, ws, dblk, linv, slots, wvec,
               qacc, ldacc, dsem, lsems, ssems):
        del a_hbm  # aliased to ws; all access goes through ws
        k = pl.program_id(0)
        row0 = k * block

        @pl.when(k == 0)
        def _():
            wvec[:] = r_ref[:]
            qacc[:] = jnp.zeros_like(qacc)
            ldacc[:] = jnp.zeros_like(ldacc)

        # ---- diagonal block: DMA in, factor in VMEM -------------------
        ld_diag = pltpu.make_async_copy(
            ws.at[:, pl.ds(row0, block), pl.ds(row0, block)], dblk, dsem)
        ld_diag.start()
        ld_diag.wait()
        linv[:] = jnp.zeros_like(linv)
        _factor_diag(dblk, linv, ldacc, block, sub, prec)
        # (L_kk itself is never re-read — ws keeps the unfactored diag
        # tile; ws is a destroyed workspace, not a valid Cholesky factor.)

        # ---- solve this panel's RHS chunk: w_k ← L_kk⁻¹ w_k -----------
        wk = _dot(linv[:, :, :], wvec[:, pl.ds(row0, block)], ((2,), (1,)), prec=prec)
        wvec[:, pl.ds(row0, block)] = wk
        qacc[:, :] += wk * wk

        # ---- panel phase: L_ik = A_ik L_kk⁻ᵀ, w_i −= L_ik w_k ---------
        m = nb - 1 - k  # trailing tiles per side (traced)

        def p_src(i):
            return ws.at[:, pl.ds(row0 + (i + 1) * block, block),
                         pl.ds(row0, block)]

        def p_load(i):
            sl = i % 2
            return pltpu.make_async_copy(p_src(i), slots.at[sl, 0],
                                         lsems.at[sl, 0])

        def p_store(i):
            sl = i % 2
            return pltpu.make_async_copy(slots.at[sl, 1], p_src(i),
                                         ssems.at[sl])

        @pl.when(m > 0)
        def _():
            p_load(jnp.asarray(0, jnp.int32)).start()

        def p_body(i, _):
            sl = i % 2

            @pl.when(i + 1 < m)
            def _():
                p_load(i + 1).start()

            p_load(i).wait()
            lik = _dot(slots[sl, 0], linv[:, :, :], ((2,), (2,)), prec=prec)
            # wait the store that last used this slot's out buffer
            @pl.when(i >= 2)
            def _():
                p_store(i - 2).wait()

            slots[sl, 1] = lik
            p_store(i).start()
            ro = row0 + (i + 1) * block
            wvec[:, pl.ds(ro, block)] = (
                wvec[:, pl.ds(ro, block)] - _dot(lik, wk, ((2,), (1,)), prec=prec))
            return 0

        lax.fori_loop(0, m, p_body, 0)
        # drain panel stores: trailing reads L_ik tiles from HBM
        @pl.when(m >= 2)
        def _():
            p_store(m - 2).wait()

        @pl.when(m >= 1)
        def _():
            p_store(m - 1).wait()

        # ---- trailing phase: A_ij −= L_ik L_jkᵀ over the lower tri ----
        ntri = m * (m + 1) // 2
        off1 = row0 + block  # trailing origin in elements

        def t_tiles(t):
            i, j = _tri_decode(t)
            a_sl = ws.at[:, pl.ds(off1 + i * block, block),
                         pl.ds(off1 + j * block, block)]
            li_sl = ws.at[:, pl.ds(off1 + i * block, block),
                          pl.ds(row0, block)]
            lj_sl = ws.at[:, pl.ds(off1 + j * block, block),
                          pl.ds(row0, block)]
            return a_sl, li_sl, lj_sl

        def t_load(t):
            sl = t % 2
            a_sl, li_sl, lj_sl = t_tiles(t)
            return (
                pltpu.make_async_copy(a_sl, slots.at[sl, 0], lsems.at[sl, 0]),
                pltpu.make_async_copy(li_sl, slots.at[sl, 1], lsems.at[sl, 1]),
                pltpu.make_async_copy(lj_sl, slots.at[sl, 2], lsems.at[sl, 2]),
            )

        def t_store(t):
            sl = t % 2
            a_sl, _, _ = t_tiles(t)
            return pltpu.make_async_copy(slots.at[sl, 0], a_sl, ssems.at[sl])

        def t_start(t):
            for dma in t_load(t):
                dma.start()

        @pl.when(ntri > 0)
        def _():
            t_start(jnp.asarray(0, jnp.int32))

        def t_body(t, _):
            sl = t % 2
            # the store that last used slot (t+1)%2's A buffer was t−1;
            # it must land before load t+1 overwrites that buffer
            @pl.when(t >= 1)
            def _():
                t_store(t - 1).wait()

            @pl.when(t + 1 < ntri)
            def _():
                t_start(t + 1)

            for dma in t_load(t):
                dma.wait()
            upd = slots[sl, 0] - _dot(slots[sl, 1], slots[sl, 2],
                                      ((2,), (2,)), prec=prec)
            slots[sl, 0] = upd
            t_store(t).start()
            return 0

        lax.fori_loop(0, ntri, t_body, 0)
        # drain the final trailing store before the next panel's reads
        @pl.when(ntri >= 1)
        def _():
            t_store(ntri - 1).wait()

        # ---- emit the two scalars on the last panel -------------------
        @pl.when(k == nb - 1)
        def _():
            out_ref[:] = jnp.stack(
                [jnp.sum(ldacc[:], axis=1), jnp.sum(qacc[:], axis=1)],
                axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block", "sub", "interpret", "prec"))
def _logdet_q_call(kmat, resid, block, sub, interpret, prec=None):
    k_batch, n, _ = kmat.shape
    nb = n // block
    kernel = _make_kernel(nb, block, sub, prec or PRECISION)
    out, _ = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_batch, 2), jnp.float32),
            jax.ShapeDtypeStruct(kmat.shape, kmat.dtype),
        ],
        input_output_aliases={0: 1},
        scratch_shapes=[
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # dblk
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # linv
            pltpu.VMEM((2, 3, k_batch, block, block), jnp.float32),  # slots
            pltpu.VMEM((k_batch, n), jnp.float32),              # w
            pltpu.VMEM((k_batch, block), jnp.float32),          # qacc
            pltpu.VMEM((k_batch, sub), jnp.float32),            # ldacc
            pltpu.SemaphoreType.DMA(()),                        # diag
            pltpu.SemaphoreType.DMA((2, 3)),                    # loads
            pltpu.SemaphoreType.DMA((2,)),                      # stores
        ],
        interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                   if interpret else False),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_batch * n**3 // 3,
            bytes_accessed=4 * k_batch * n * n * 4,
            transcendentals=k_batch * n,
        ),
    )(kmat, resid)
    return out[:, 0], out[:, 1]


def supported(n: int, on_tpu: bool | None = None) -> bool:
    """Shapes this kernel accepts on the current backend."""
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    return on_tpu and n % BLOCK == 0 and n >= 2 * BLOCK


def logdet_q_pallas(
    kmat: jnp.ndarray,
    resid: jnp.ndarray,
    block: int = BLOCK,
    sub: int = SUB,
    interpret: bool | None = None,
    prec: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Σ log diag chol(K), ‖chol(K)⁻¹ r‖²) for a batch of PSD matrices.

    kmat: [K, N, N] (destroyed semantics: the buffer is donated to the
    kernel as an in-place workspace), resid: [K, N].  Returns two [K]
    vectors.  N must be a multiple of ``block``.  Batches larger than
    MAX_BATCH are chunked to bound VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch = kmat.shape[0]
    if k_batch > MAX_BATCH:
        nchunk = -(-k_batch // MAX_BATCH)
        pad = nchunk * MAX_BATCH - k_batch
        if pad:
            eye = jnp.eye(kmat.shape[-1], dtype=kmat.dtype)
            kmat = jnp.concatenate(
                [kmat, jnp.broadcast_to(eye, (pad,) + kmat.shape[1:])])
            resid = jnp.concatenate(
                [resid, jnp.zeros((pad,) + resid.shape[1:], resid.dtype)])
        km = kmat.reshape((nchunk, MAX_BATCH) + kmat.shape[1:])
        rs = resid.reshape((nchunk, MAX_BATCH) + resid.shape[1:])
        ld, q = lax.map(
            lambda ab: _logdet_q_call(ab[0], ab[1], block, sub, interpret,
                                      prec),
            (km, rs))
        return ld.reshape(-1)[:k_batch], q.reshape(-1)[:k_batch]
    return _logdet_q_call(kmat, resid, block, sub, interpret, prec)
