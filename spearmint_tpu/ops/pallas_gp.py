"""Fused GP log-marginal factorization — one Pallas kernel per evaluation.

The slice-sampling hot loop evaluates, per proposal, the GP log-marginal

    lp = -Σ log diag(L) - ½‖L⁻¹r‖²,   L = chol(K)

(core/likelihood.py; reference ``GPEIOptChooser.logprob`` per SURVEY.md
§3.2).  Round-3 profiling (docs/PROFILE_r3.md) measured the XLA pipeline
for this at ~107 ms per batched-10 evaluation at N=5120 on v5e (host-
transfer-synced): a batched Cholesky running at 6.6 TF/s — half of it
sequential panel latency XLA cannot hide — plus a latency-bound
single-RHS triangular solve.  The r2/r3 per-panel Pallas/XLA hybrid
(retired in r4) showed the MXU can hold 15.6 TF/s on the trailing
update but lost it all to per-panel orchestration (aliased copies,
dynamic_update_slice round trips, broken fusions).

This kernel does the ENTIRE evaluation in ONE ``pallas_call``:

  * right-looking blocked Cholesky over B=512 panels, the O(N³/3)
    trailing update streamed through VMEM with multi-buffered manual
    DMA (grid is sequential over panels; the matrix lives in HBM as a
    workspace destroyed in place);
  * the diagonal-block factorization in VMEM: serial base-block columns
    (the irreducible N-column dependency chain, paid on [K, b, b]
    sub-tiles at ~2 vector passes per column — the column store is
    fused into the rank-1 update) plus base inverses via nilpotent
    repeated squaring on the MXU (L⁻¹ = D⁻¹·Σ(−S)^k, exactly
    log₂ b doublings — no second substitution pass);
  * the RHS solved DURING factorization (w ← L⁻¹r interleaved with the
    panel sweep), so the latency-bound standalone trisolve disappears;
  * only the two scalars the sampler needs — Σ log diag(L) and ‖w‖² —
    leave the chip.

Two assembly modes:

  * ``logdet_q_pallas(K, r)`` — takes the assembled covariance; the
    input buffer is aliased and destroyed.
  * ``shifted_logdet_q_pallas(M, dadd/amp2, r)`` — the M-form
    K = amp2·M + diag(dadd) every marginal evaluation routes through
    (core/likelihood.log_marginal via linalg.fma_logdet_q): the shift
    is applied IN-KERNEL on each diagonal tile and the caller rescales
    the outputs analytically, so the O(N²) XLA pass that scales and
    re-materializes the full covariance per evaluation disappears.

A failed factorization (non-PSD proposal) yields NaN through the sqrt,
which propagates to both outputs; callers map NaN → −inf exactly as the
XLA path does.  Padded identity rows/cols (linalg.mask_psd_matrix)
factor to unit diagonal entries and zero residuals, contributing 0 to
both outputs, so masking semantics are unchanged.

Numerics: all MXU contractions run at ``Precision.HIGHEST`` (6-pass
bf16 = full f32; Mosaic's DEFAULT measured 2e-3 relative on the
log-determinant at N=5120 — far too coarse for the sampler, while
HIGHEST agrees with XLA to ~1e-7).

Off-TPU the kernel runs in the Pallas TPU interpreter, so CPU tests
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
# at v5e HBM bandwidth, mostly hidden under the MXU trailing update)
# against VMEM residency (nine [K, B, B] tile buffers = 90 MB at K=10).
BLOCK = 512
# Base width of the serial column sweep inside a diagonal block.  The
# N-column dependency chain is irreducible; b only sets the per-column
# VPU cost ([K, b, b] passes) vs vector-lane utilization.
SUB = 128
# Largest chain batch factored in one kernel call (VMEM: ~9·K MB of
# tile buffers).  Callers chunk.
MAX_BATCH = 10

# MXU precision.  Only "highest" preserves sampler-grade accuracy (see
# module docstring); exposed for experiments.
PRECISION = "highest"

# Interpret-mode DMA semantics for CPU tests.  "eager" (fast: every copy
# completes at start()) is the CI default; tests also run "on_wait"
# (copies land only at wait() — the real-hardware model) with the
# interpreter's vector-clock race detector to exercise the
# multi-buffered load/store logic (ADVICE r3 #1).
INTERPRET_DMA = "eager"
INTERPRET_DETECT_RACES = False


def _interpret_params():
    return pltpu.InterpretParams(
        dma_execution_mode=INTERPRET_DMA,
        detect_races=INTERPRET_DETECT_RACES,
    )


def _dot(a, b, contract, batch=((0,), (0,)), prec=None):
    return lax.dot_general(
        a, b, (contract, batch),
        precision=(prec or PRECISION),
        preferred_element_type=jnp.float32,
    )


def _tri_decode(t):
    """Linear index t → (i, j) in the lower triangle, row-major:
    t = i(i+1)/2 + j with j ≤ i.  f32 sqrt seed + exact integer fixup."""
    i = ((jnp.sqrt(8.0 * t.astype(jnp.float32) + 1.0) - 1.0) / 2.0).astype(
        jnp.int32
    )
    i = jnp.where((i + 1) * (i + 2) // 2 <= t, i + 1, i)
    i = jnp.where(i * (i + 1) // 2 > t, i - 1, i)
    j = t - i * (i + 1) // 2
    return i, j


def _factor_base(a):
    """Serial Cholesky of a [K, b, b] SPD value.

    Returns (L, d): d the [K, b] diagonal pivots.  Two [K, b, b] vector
    passes per column: the column extraction, and one fused FMA that
    both applies the rank-1 trailing update and stores the finished
    column (A += l ⊗ (e_j − l) zeroes column j of the remainder and
    writes l there in the same pass, so A ends as exactly L).
    """
    dtype = a.dtype
    b = a.shape[-1]
    k_batch = a.shape[0]
    lanes = lax.broadcasted_iota(jnp.int32, (1, b), 1)          # [1, b]

    unroll = 4  # Mosaic's fori only unrolls fully; unroll by hand

    def one_col(j, a, dvec):
        onev = (lanes == j).astype(dtype)                       # [1, b]
        below = (lanes >= j).astype(dtype)
        # dynamic lane rotate + static lane-0 slice — one vector pass,
        # vs a masked multiply + cross-lane reduction per column
        col = pltpu.roll(a, -j, axis=2)[:, :, 0]                # [K, b]
        d2 = pltpu.roll(col, -j, axis=1)[:, 0]                  # [K]
        inv_d = lax.rsqrt(d2)
        d = d2 * inv_d                                          # sqrt(d2)
        l = col * inv_d[:, None] * below                        # [K, b]
        a = a + l[:, :, None] * (onev - l)[:, None, :]
        dvec = dvec + d[:, None] * onev
        return a, dvec

    def body(t, carry):
        a, dvec = carry
        for u in range(unroll):
            a, dvec = one_col(t * unroll + u, a, dvec)
        return a, dvec

    init = (a, jnp.zeros((k_batch, b), dtype))
    lmat, dvec = lax.fori_loop(0, b // unroll, body, init)
    return lmat, dvec


def _tri_inv_sq(lmat, dvec, prec):
    """[K, b, b] lower-triangular inverse by nilpotent repeated squaring.

    L = (I + S)·D with S = strict(L)·D⁻¹ strictly lower (nilpotent of
    index b), so (I + S)⁻¹ = Σ_{k<b} (−S)^k, accumulated in log₂ b
    doublings of MXU GEMMs: Y ← Y(I + P), P ← P² with P starting at −S.
    Replaces a second b-step serial substitution loop.
    """
    b = lmat.shape[-1]
    dtype = lmat.dtype
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    strict = (rows > cols).astype(dtype)
    eye = (rows == cols).astype(dtype)
    inv_d = 1.0 / dvec
    neg_s = -(lmat * strict) * inv_d[:, None, :]                # −S
    y = eye + neg_s                                             # Σ_{k<2}
    p = neg_s
    # After t doublings the series covers orders < 2^(t+1); S is
    # nilpotent of index b, so we need 2^(t+1) ≥ b — ⌈log₂ b⌉ − 1
    # doublings (NOT bit_length−2, which under-counts for non-power-of-
    # two b and would silently truncate the inverse).
    iters = max(0, (b - 1).bit_length() - 1)
    for _ in range(iters):
        p = _dot(p, p, ((2,), (1,)), prec=prec)
        y = y + _dot(y, p, ((2,), (1,)), prec=prec)             # Y(I+P)
    return y * inv_d[:, :, None]                                # D⁻¹·Y


def _factor_diag_sub(dblk, linv, ldacc, block, sub, prec, s):
    """One sub-step of the diagonal-block factorization: serial base s,
    its inverse, the in-block trailing update, and (s > 0) the
    sub-diagonal L⁻¹ strip for row s.  Splitting per sub-step lets the
    interleaved kernel spread these bursts across the previous panel's
    trailing GEMM stream (Mosaic co-issues the VPU column sweep with
    independent MXU work — measured interleaved ≈ max, not sum)."""
    off = s * sub
    a_s = dblk[:, off:off + sub, off:off + sub]
    l_s, dvec = _factor_base(a_s)
    dblk[:, off:off + sub, off:off + sub] = l_s
    linv[:, off:off + sub, off:off + sub] = _tri_inv_sq(l_s, dvec, prec)
    ldacc[:, :sub] += jnp.log(dvec)
    rs = block - (off + sub)
    if rs > 0:
        li_s = linv[:, off:off + sub, off:off + sub]
        a21 = dblk[:, off + sub:, off:off + sub]                # [K, rs, b]
        l21 = _dot(a21, li_s, ((2,), (2,)), prec=prec)
        dblk[:, off + sub:, off:off + sub] = l21
        a22 = dblk[:, off + sub:, off + sub:]
        dblk[:, off + sub:, off + sub:] = a22 - _dot(
            l21, l21, ((2,), (2,)), prec=prec)
    if s > 0:
        # sub-diagonal L⁻¹ strip by block forward substitution:
        # X_{s,0:off} = −L_ss⁻¹ · L_{s,0:off} · X_{0:off,0:off}
        # (rows < s are complete — the merged ordering is equivalent to
        # the original two-pass loop)
        lstrip = dblk[:, off:off + sub, 0:off]                  # [K, b, off]
        xtl = linv[:, 0:off, 0:off]
        tmp = _dot(lstrip, xtl, ((2,), (1,)), prec=prec)
        ltt_inv = linv[:, off:off + sub, off:off + sub]
        linv[:, off:off + sub, 0:off] = -_dot(
            ltt_inv, tmp, ((2,), (1,)), prec=prec)


def _factor_diag(dblk, linv, ldacc, block, sub, prec):
    """Factor the [K, block, block] diagonal block resident in ``dblk``
    (VMEM ref), writing L in place, L⁻¹ into ``linv`` and accumulating
    Σ log d into ``ldacc``.  Two-level: SUB-wide serial bases + MXU glue.
    """
    for s in range(block // sub):
        _factor_diag_sub(dblk, linv, ldacc, block, sub, prec, s)


def _diag_of_tri(lmat):
    """[K, b] diagonal of a [K, b, b] tile (iota mask + lane reduce)."""
    b = lmat.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = rows == cols
    return jnp.sum(jnp.where(eye[None], lmat, 0.0), axis=2)


def _invert_tri_vmem(src, dst, block, sub, prec):
    """dst ← src⁻¹ for an already-factored lower-triangular
    [K, block, block] tile (both VMEM refs; dst must be zeroed).

    Same two-level scheme as ``_factor_diag``'s inverse assembly:
    SUB-wide base inverses by nilpotent repeated squaring, then block
    forward substitution on the MXU for the sub-diagonal strips.
    """
    n_sub = block // sub
    for s in range(n_sub):
        off = s * sub
        l_s = src[:, off:off + sub, off:off + sub]
        dvec = _diag_of_tri(l_s)
        dst[:, off:off + sub, off:off + sub] = _tri_inv_sq(l_s, dvec, prec)
    for t in range(1, n_sub):
        off = t * sub
        lstrip = src[:, off:off + sub, 0:off]
        xtl = dst[:, 0:off, 0:off]
        tmp = _dot(lstrip, xtl, ((2,), (1,)), prec=prec)
        ltt_inv = dst[:, off:off + sub, off:off + sub]
        dst[:, off:off + sub, 0:off] = -_dot(
            ltt_inv, tmp, ((2,), (1,)), prec=prec)


def _diag_tile(dadd, roff, blk):
    """diag(dadd[roff:roff+blk]) as a [K, blk, blk] tile."""
    rr = lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    cc = lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    dv = dadd[:, pl.ds(roff, blk)]
    return jnp.where((rr == cc)[None], dv[:, :, None], 0.0)


def _make_kernel(nb, block, sub, prec, shift, debug_skip="",
                 emit=False):
    """Build the kernel body for an N = nb·block matrix.

    Args: (a_hbm[, dshift], r) with a aliased to the ws output.  With
    ``shift`` the kernel factors A + diag(dshift) — the diagonal vector
    is added to each diagonal tile right after its DMA, which is all
    the joint-move form K = amp2·(M + diag(dadd/amp2)) needs: the
    caller rescales the two outputs by amp2 analytically
    (linalg.fma_logdet_q), so the O(N²) assembly pass disappears
    without touching any off-diagonal tile.

    With ``emit`` the factored diagonal blocks are written back to the
    workspace (tril-masked) so ws leaves the kernel as the true lower
    Cholesky factor L on and below the diagonal (tiles strictly above
    the block diagonal keep the input's symmetric values — triangular
    consumers must not read them), and the solved RHS w = L⁻¹r is
    emitted as a third output.  This is the posterior-cache path
    (linalg.cache_factor / factor_solve): the factorization feeds
    ``tri_inverse_pallas`` instead of being recomputed by XLA.
    """

    def kernel(*refs):
        if shift:
            (a_hbm, dshift, r_ref, out_ref, ws, *rest) = refs
        else:
            (a_hbm, r_ref, out_ref, ws, *rest) = refs
        if emit:
            w_out, *rest = rest
        (dblk, linv, aslots, lslots, wvec, qacc, ldacc,
         dsem, asems, assems, lsems, psems) = rest
        del a_hbm  # aliased to ws; all access goes through ws

        k = pl.program_id(0)
        row0 = k * block
        first = k == 0

        @pl.when(first)
        def _():
            wvec[:] = r_ref[:]
            qacc[:] = jnp.zeros_like(qacc)
            ldacc[:] = jnp.zeros_like(ldacc)

        # ---- diagonal block: DMA in, factor in VMEM -------------------
        def load_factor_diag():
            ld_diag = pltpu.make_async_copy(
                ws.at[:, pl.ds(row0, block), pl.ds(row0, block)],
                dblk, dsem)
            ld_diag.start()
            ld_diag.wait()
            if shift:
                dblk[:, :, :] = (dblk[:, :, :]
                                 + _diag_tile(dshift, row0, block))
            linv[:] = jnp.zeros_like(linv)
            _factor_diag(dblk, linv, ldacc, block, sub, prec)

        load_factor_diag()
        if emit:
            # write L_kk back (tril-masked) so ws is the true factor
            rr = lax.broadcasted_iota(jnp.int32, (block, block), 0)
            cc = lax.broadcasted_iota(jnp.int32, (block, block), 1)
            dblk[:, :, :] = jnp.where((rr >= cc)[None], dblk[:, :, :], 0.0)
            st_diag = pltpu.make_async_copy(
                dblk, ws.at[:, pl.ds(row0, block), pl.ds(row0, block)],
                dsem)
            st_diag.start()
            st_diag.wait()
        # (otherwise L_kk is never re-read — ws keeps the unfactored
        # diag tile; ws is a destroyed workspace, not a valid factor.)

        # ---- solve this panel's RHS chunk: w_k ← L_kk⁻¹ w_k -----------
        wk = _dot(linv[:, :, :], wvec[:, pl.ds(row0, block)], ((2,), (1,)),
                  prec=prec)
        wvec[:, pl.ds(row0, block)] = wk
        qacc[:, :] += wk * wk

        # ---- panel phase: L_ik = A_ik L_kk⁻ᵀ, w_i −= L_ik w_k ---------
        m = jnp.asarray(0, jnp.int32) if debug_skip == "diag_only" else (
            nb - 1 - k)

        def p_row(i):
            return row0 + (i + 1) * block

        def p_src_ws(i):
            return ws.at[:, pl.ds(p_row(i), block), pl.ds(row0, block)]

        def p_load(i):
            return pltpu.make_async_copy(p_src_ws(i), aslots.at[i % 3],
                                         asems.at[i % 3])

        def p_start(i):
            p_load(i).start()

        def p_store(i):
            return pltpu.make_async_copy(lslots.at[i % 2, 0], p_src_ws(i),
                                         psems.at[i % 2])

        @pl.when(m > 0)
        def _():
            p_start(jnp.asarray(0, jnp.int32))

        def p_body(i, _):
            sl = i % 3

            @pl.when(i + 1 < m)
            def _():
                p_start(i + 1)

            p_load(i).wait()
            lik = _dot(aslots[sl], linv[:, :, :], ((2,), (2,)), prec=prec)
            # wait the store that last used this slot's out buffer
            @pl.when(i >= 2)
            def _():
                p_store(i - 2).wait()

            lslots[i % 2, 0] = lik
            p_store(i).start()
            ro = p_row(i)
            wvec[:, pl.ds(ro, block)] = (
                wvec[:, pl.ds(ro, block)]
                - _dot(lik, wk, ((2,), (1,)), prec=prec))
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
        ntri = (jnp.asarray(0, jnp.int32) if debug_skip == "no_trailing"
                else m * (m + 1) // 2)
        off1 = row0 + block  # trailing origin in elements

        def t_a_ws(t):
            i, j = _tri_decode(t)
            return ws.at[:, pl.ds(off1 + i * block, block),
                         pl.ds(off1 + j * block, block)]

        def t_load_a(t):
            return pltpu.make_async_copy(t_a_ws(t), aslots.at[t % 3],
                                         asems.at[t % 3])

        def t_load_l(t):
            i, j = _tri_decode(t)
            sl = t % 2
            return (
                pltpu.make_async_copy(
                    ws.at[:, pl.ds(off1 + i * block, block),
                          pl.ds(row0, block)],
                    lslots.at[sl, 0], lsems.at[sl, 0]),
                pltpu.make_async_copy(
                    ws.at[:, pl.ds(off1 + j * block, block),
                          pl.ds(row0, block)],
                    lslots.at[sl, 1], lsems.at[sl, 1]),
            )

        def t_store(t):
            return pltpu.make_async_copy(aslots.at[t % 3], t_a_ws(t),
                                         assems.at[t % 3])

        def t_start(t):
            t_load_a(t).start()
            for dma in t_load_l(t):
                dma.start()

        @pl.when(ntri > 0)
        def _():
            t_start(jnp.asarray(0, jnp.int32))

        def t_body(t, _):
            sl = t % 3
            # the store that last used A slot (t+1)%3 was t−2; it must
            # land before load t+1 overwrites that buffer (2 iterations
            # old — usually already complete, unlike a t−1 wait)
            @pl.when(t >= 2)
            def _():
                t_store(t - 2).wait()

            @pl.when(t + 1 < ntri)
            def _():
                t_start(t + 1)

            t_load_a(t).wait()
            for dma in t_load_l(t):
                dma.wait()
            lsl = t % 2
            aslots[sl] = aslots[sl] - _dot(
                lslots[lsl, 0], lslots[lsl, 1], ((2,), (2,)), prec=prec)
            t_store(t).start()
            return 0

        lax.fori_loop(0, ntri, t_body, 0)
        # drain the final trailing stores before the next panel's reads
        @pl.when(ntri >= 2)
        def _():
            t_store(ntri - 2).wait()

        @pl.when(ntri >= 1)
        def _():
            t_store(ntri - 1).wait()

        # ---- emit the two scalars on the last panel -------------------
        @pl.when(k == nb - 1)
        def _():
            out_ref[:] = jnp.stack(
                [jnp.sum(ldacc[:], axis=1), jnp.sum(qacc[:], axis=1)],
                axis=1)
            if emit:
                w_out[:] = wvec[:]

    return kernel


def _call(kmat, extra_inputs, resid, block, sub, interpret, prec,
          shift, debug_skip, emit=False):
    k_batch, n, _ = kmat.shape
    # Shape preconditions (tracing-time; violating any silently corrupts
    # the factorization rather than erroring inside Mosaic):
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if block % sub != 0:
        raise ValueError(f"block={block} must be a multiple of sub={sub}")
    if sub % 4 != 0:
        raise ValueError(f"sub={sub} must be a multiple of the column "
                         "unroll (4)")
    nb = n // block
    kernel = _make_kernel(nb, block, sub, prec or PRECISION, shift,
                          debug_skip, emit)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (
        len(extra_inputs) + 1)
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((k_batch, 2), jnp.float32),
        jax.ShapeDtypeStruct(kmat.shape, kmat.dtype),
    ]
    if emit:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(resid.shape, jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={0: 1},
        scratch_shapes=[
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # dblk
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # linv
            pltpu.VMEM((3, k_batch, block, block), jnp.float32),   # aslots
            pltpu.VMEM((2, 2, k_batch, block, block), jnp.float32),  # lslots
            pltpu.VMEM((k_batch, n), jnp.float32),              # w
            pltpu.VMEM((k_batch, block), jnp.float32),          # qacc
            pltpu.VMEM((k_batch, block), jnp.float32),          # ldacc
            pltpu.SemaphoreType.DMA(()),                        # diag
            pltpu.SemaphoreType.DMA((3,)),                      # A loads
            pltpu.SemaphoreType.DMA((3,)),                      # A stores
            pltpu.SemaphoreType.DMA((2, 2)),                    # L loads
            pltpu.SemaphoreType.DMA((2,)),                      # panel st
        ],
        interpret=_interpret_params() if interpret else False,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_batch * n**3 // 3,
            bytes_accessed=4 * k_batch * n * n * 4,
            transcendentals=k_batch * n,
        ),
    )(kmat, *extra_inputs, resid)
    if emit:
        scal, lmat, w = out
        return scal[:, 0], scal[:, 1], lmat, w
    scal = out[0]
    return scal[:, 0], scal[:, 1]


@functools.partial(
    jax.jit,
    static_argnames=("block", "sub", "interpret", "prec", "debug_skip"))
def _logdet_q_call(kmat, resid, block, sub, interpret, prec=None,
                   debug_skip=""):
    return _call(kmat, (), resid, block, sub, interpret, prec, False,
                 debug_skip)


@functools.partial(
    jax.jit,
    static_argnames=("block", "sub", "interpret", "prec", "debug_skip"))
def _shifted_logdet_q_call(kmat, dshift, resid, block, sub, interpret,
                           prec=None, debug_skip=""):
    return _call(kmat, (dshift,), resid, block, sub, interpret, prec,
                 True, debug_skip)


@functools.partial(
    jax.jit,
    static_argnames=("block", "sub", "interpret", "prec", "debug_skip"))
def _factor_logdet_q_call(kmat, resid, block, sub, interpret, prec=None,
                          debug_skip=""):
    return _call(kmat, (), resid, block, sub, interpret, prec, False,
                 debug_skip, emit=True)


@functools.partial(
    jax.jit,
    static_argnames=("block", "sub", "interpret", "prec", "debug_skip"))
def _shifted_factor_call(kmat, dshift, resid, block, sub, interpret,
                         prec=None, debug_skip=""):
    return _call(kmat, (dshift,), resid, block, sub, interpret, prec,
                 True, debug_skip, emit=True)


# ---------------------------------------------------------------------------
# Blocked triangular inversion: X = L⁻¹ for the posterior caches.
#
# XLA's chunked triangular solve against the identity (linalg.tri_inverse)
# measured 0.139 s at [10, 5120, 5120] (9.6 TF/s — sequential panel latency
# again).  This kernel runs the block forward substitution
#     X_ii = L_ii⁻¹,    X_ij = −X_ii · Σ_{j≤k<i} L_ik X_kj   (j < i)
# with the diagonal-block inverses from the same nilpotent-squaring
# primitive the factorization uses, one grid step per block row (row i
# reads X rows < i written by earlier steps), double-buffered DMA on the
# accumulation operands.  Strictly-upper tiles of the output are zeroed so
# X is a complete dense matrix (consumers GEMM against it directly).
# ---------------------------------------------------------------------------


def _make_inv_kernel(nb, block, sub, prec):
    def kernel(l_hbm, x_hbm, ltile, dinv, zeros, lbuf, xbuf, acc,
               dsem, stsem, lsems, xsems, zsem):
        i = pl.program_id(0)
        row0 = i * block

        # ---- X_ii = L_ii⁻¹ -------------------------------------------
        ld = pltpu.make_async_copy(
            l_hbm.at[:, pl.ds(row0, block), pl.ds(row0, block)], ltile,
            dsem)
        ld.start()
        ld.wait()
        dinv[:] = jnp.zeros_like(dinv)
        _invert_tri_vmem(ltile, dinv, block, sub, prec)
        st = pltpu.make_async_copy(
            dinv, x_hbm.at[:, pl.ds(row0, block), pl.ds(row0, block)],
            dsem)
        st.start()
        st.wait()

        # ---- zero the strictly-upper tiles of this block row ----------
        @pl.when(i == 0)
        def _():
            zeros[:] = jnp.zeros_like(zeros)

        def z_body(u, _):
            col0 = row0 + (u + 1) * block
            stz = pltpu.make_async_copy(
                zeros, x_hbm.at[:, pl.ds(row0, block), pl.ds(col0, block)],
                zsem)
            stz.start()
            stz.wait()
            return 0

        lax.fori_loop(0, nb - 1 - i, z_body, 0)

        # ---- off-diagonal blocks: X_ij over j < i ---------------------
        def load_pair(j, k, sl):
            return (
                pltpu.make_async_copy(
                    l_hbm.at[:, pl.ds(row0, block),
                             pl.ds(k * block, block)],
                    lbuf.at[sl], lsems.at[sl]),
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(k * block, block),
                             pl.ds(j * block, block)],
                    xbuf.at[sl], xsems.at[sl]),
            )

        def j_body(j, _):
            # k runs j..i-1; slot = (k - j) % 2
            for dma in load_pair(j, j, 0):
                dma.start()
            acc[:] = jnp.zeros_like(acc)

            def k_body(k, _):
                sl = (k - j) % 2

                @pl.when(k + 1 < i)
                def _():
                    for dma in load_pair(j, k + 1, (k - j + 1) % 2):
                        dma.start()

                for dma in load_pair(j, k, sl):
                    dma.wait()
                acc[:, :, :] = acc[:, :, :] + _dot(
                    lbuf[sl], xbuf[sl], ((2,), (1,)), prec=prec)
                return 0

            lax.fori_loop(j, i, k_body, 0)
            xa = -_dot(dinv[:, :, :], acc[:, :, :], ((2,), (1,)),
                       prec=prec)
            acc[:, :, :] = xa
            stx = pltpu.make_async_copy(
                acc, x_hbm.at[:, pl.ds(row0, block),
                              pl.ds(j * block, block)], stsem)
            stx.start()
            stx.wait()  # later rows read this tile; keep ordering strict
            return 0

        lax.fori_loop(0, i, j_body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block", "sub", "interpret", "prec"))
def _tri_inverse_call(lmat, block, sub, interpret, prec=None):
    k_batch, n, _ = lmat.shape
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if block % sub != 0:
        raise ValueError(f"block={block} must be a multiple of sub={sub}")
    nb = n // block
    kernel = _make_inv_kernel(nb, block, sub, prec or PRECISION)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(lmat.shape, lmat.dtype),
        scratch_shapes=[
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # ltile
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # dinv
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # zeros
            pltpu.VMEM((2, k_batch, block, block), jnp.float32),  # lbuf
            pltpu.VMEM((2, k_batch, block, block), jnp.float32),  # xbuf
            pltpu.VMEM((k_batch, block, block), jnp.float32),   # acc
            pltpu.SemaphoreType.DMA(()),                        # diag
            pltpu.SemaphoreType.DMA(()),                        # stores
            pltpu.SemaphoreType.DMA((2,)),                      # L loads
            pltpu.SemaphoreType.DMA((2,)),                      # X loads
            pltpu.SemaphoreType.DMA(()),                        # zeros st
        ],
        interpret=_interpret_params() if interpret else False,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=k_batch * n**3 // 3,
            bytes_accessed=4 * k_batch * n * n * 4,
            transcendentals=0,
        ),
    )(lmat)


def factor_logdet_q_pallas(
    kmat: jnp.ndarray,
    resid: jnp.ndarray,
    block: int | None = None,
    sub: int = SUB,
    interpret: bool | None = None,
    prec: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(Σ log diag L, ‖w‖², L, w = L⁻¹r) — the posterior-cache form.

    Same factorization as ``logdet_q_pallas`` but the factor survives:
    L is the donated input buffer rewritten in place (valid on and
    below the diagonal; tiles strictly above the block diagonal retain
    input values — triangular consumers only).  Batches above
    MAX_BATCH are chunked.
    """
    if block is None:
        block = _pick_block(kmat.shape[-1])
        sub = min(sub, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch = kmat.shape[0]

    def call(k, r):
        return _factor_logdet_q_call(k, r, block, sub, interpret, prec)

    if k_batch > MAX_BATCH:
        eye = jnp.eye(kmat.shape[-1], dtype=kmat.dtype)
        zero = jnp.zeros(resid.shape[1:], resid.dtype)
        return _chunked(call, [kmat, resid], k_batch, [eye, zero],
                        n_out=4)
    return call(kmat, resid)


def shifted_factor_logdet_q_pallas(
    m0: jnp.ndarray,
    dshift: jnp.ndarray,
    resid: jnp.ndarray,
    block: int | None = None,
    sub: int = SUB,
    interpret: bool | None = None,
    prec: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shifted form of ``factor_logdet_q_pallas``: factor M + diag(dshift)
    and emit (Σ log diag L̃, ‖w̃‖², L̃, w̃ = L̃⁻¹r).

    The posterior-cache path uses this so the cache factors the
    covariance through the SAME in-kernel assembly/rounding the
    slice sampler evaluated it with (linalg.fma_logdet_q): a state the
    sampler accepted as finite then factors finitely here too, where a
    separately XLA-assembled K at the same hypers was observed to NaN
    at the f32 conditioning edge (tests/test_tpu_smoke.py, r4).  The
    caller rescales by amp2 analytically (linalg.cache_factor).
    """
    if block is None:
        block = _pick_block(m0.shape[-1])
        sub = min(sub, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch = m0.shape[0]

    def call(m, d, r):
        return _shifted_factor_call(m, d, r, block, sub, interpret, prec)

    if k_batch > MAX_BATCH:
        zmat = jnp.zeros(m0.shape[1:], m0.dtype)
        done = jnp.ones(dshift.shape[1:], dshift.dtype)
        zero = jnp.zeros(resid.shape[1:], resid.dtype)
        return _chunked(call, [m0, dshift, resid], k_batch,
                        [zmat, done, zero], n_out=4)
    return call(m0, dshift, resid)


def tri_inverse_pallas(
    lmat: jnp.ndarray,
    block: int | None = None,
    sub: int = SUB,
    interpret: bool | None = None,
    prec: str | None = None,
) -> jnp.ndarray:
    """X = L⁻¹ for a batch of lower-triangular [K, N, N] factors.

    Accepts factors whose strictly-upper block tiles contain garbage
    (``factor_logdet_q_pallas`` output); the result is a complete dense
    matrix with exact zeros above the diagonal.
    """
    if block is None:
        block = _pick_block(lmat.shape[-1])
        sub = min(sub, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch = lmat.shape[0]

    def call(lm):
        return _tri_inverse_call(lm, block, sub, interpret, prec)

    if k_batch > MAX_BATCH:
        eye = jnp.eye(lmat.shape[-1], dtype=lmat.dtype)
        return _chunked(call, [lmat], k_batch, [eye], n_out=1)
    return call(lmat)


def _pick_block(n: int) -> int:
    """Largest supported panel width dividing n.

    Pad buckets are powers of two plus quarter midpoints, so some
    (640, 896, 1280, 1792, ...) are not multiples of 512; falling back
    to 256- or 128-wide panels keeps the fused path engaged across
    every bucket ≥ 512 instead of cliffing to the XLA sequence.
    Smaller panels pay more per-panel orchestration but the serial
    column count (the dominant cost) is block-independent."""
    for b in (BLOCK, 256, 128):
        if n % b == 0:
            return b
    raise ValueError(f"n={n} is not a multiple of 128")


def supported(n: int, on_tpu: bool | None = None) -> bool:
    """Shapes this kernel accepts on the current backend.

    nb=1 (n == block) is a valid degenerate case: diagonal-only
    factorization, no panel/trailing phases (their loops run 0 times).
    """
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    return on_tpu and n >= 512 and n % 128 == 0


def _chunked(fn, batch_args, k_batch, pad_args, n_out=2):
    """Run ``fn`` over MAX_BATCH-sized chunks of the leading axis.

    pad_args supply one identity-problem element per argument so padded
    lanes factor I (finite, discarded).  Outputs (n_out of them, each
    with the chunked leading axis) are re-flattened and trimmed."""
    nchunk = -(-k_batch // MAX_BATCH)
    pad = nchunk * MAX_BATCH - k_batch
    if pad:
        batch_args = [
            jnp.concatenate([a, jnp.broadcast_to(p, (pad,) + a.shape[1:])])
            for a, p in zip(batch_args, pad_args)
        ]
    shaped = [a.reshape((nchunk, MAX_BATCH) + a.shape[1:])
              for a in batch_args]
    out = lax.map(lambda ab: fn(*ab), tuple(shaped))
    if n_out == 1:
        out = (out,)
    flat = tuple(
        a.reshape((nchunk * MAX_BATCH,) + a.shape[2:])[:k_batch]
        for a in out
    )
    return flat[0] if n_out == 1 else flat


def logdet_q_pallas(
    kmat: jnp.ndarray,
    resid: jnp.ndarray,
    block: int | None = None,
    sub: int = SUB,
    interpret: bool | None = None,
    prec: str | None = None,
    debug_skip: str = "",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Σ log diag chol(K), ‖chol(K)⁻¹ r‖²) for a batch of PSD matrices.

    kmat: [K, N, N] (destroyed semantics: the buffer is donated to the
    kernel as an in-place workspace), resid: [K, N].  Returns two [K]
    vectors.  N must be a multiple of ``block``.  Batches larger than
    MAX_BATCH are chunked to bound VMEM.
    """
    if block is None:
        block = _pick_block(kmat.shape[-1])
        sub = min(sub, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch = kmat.shape[0]

    def call(k, r):
        return _logdet_q_call(k, r, block, sub, interpret, prec,
                              debug_skip)

    if k_batch > MAX_BATCH:
        eye = jnp.eye(kmat.shape[-1], dtype=kmat.dtype)
        zero = jnp.zeros(resid.shape[1:], resid.dtype)
        return _chunked(call, [kmat, resid], k_batch, [eye, zero])
    return call(kmat, resid)


def shifted_logdet_q_pallas(
    m0: jnp.ndarray,
    dshift: jnp.ndarray,
    resid: jnp.ndarray,
    block: int | None = None,
    sub: int = SUB,
    interpret: bool | None = None,
    prec: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Diagonal-shifted form: factor m0 + diag(dshift).

    The joint slice move evaluates K = amp2·M + diag(dadd) ~10× per
    move against the SAME unit covariance M.  Since
    chol(amp2·(M + diag(dadd/amp2))) = √amp2 · chol(M + diag(dadd/amp2)),
    the caller can factor the SHIFTED unit matrix and rescale the two
    outputs analytically (linalg.fma_logdet_q) — no O(N²) assembly pass,
    no off-diagonal traffic beyond the factorization's own.  The shift
    is applied to each diagonal tile in-kernel right after its DMA.

    m0: [K, N, N] (destroyed; XLA inserts a copy because the caller's
    M outlives the move), dshift: [K, N], resid: [K, N].
    """
    if block is None:
        block = _pick_block(m0.shape[-1])
        sub = min(sub, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch = m0.shape[0]

    def call(m, d, r):
        return _shifted_logdet_q_call(m, d, r, block, sub, interpret, prec)

    if k_batch > MAX_BATCH:
        # padded lanes factor 0 + diag(1) = I: finite, discarded.
        zmat = jnp.zeros(m0.shape[1:], m0.dtype)
        done = jnp.ones(dshift.shape[1:], dshift.dtype)
        zero = jnp.zeros(resid.shape[1:], resid.dtype)
        return _chunked(call, [m0, dshift, resid], k_batch,
                        [zmat, done, zero])
    return call(m0, dshift, resid)
