"""Blocked Householder band reduction for the joint slice move.

The joint (mean, amp2, noise) move evaluates the GP log marginal of
K = amp2·M + diag(dadd) ~10-16× per move against a FIXED unit
covariance M (only the three scalars change; SURVEY.md §3.2's
``_sample_noisy`` hot loop).  Every evaluation through the fused
Cholesky kernel is O(n³); this module makes them O(n·b²):

  1. ``reduce_to_band``  — ONE two-sided blocked Householder reduction
     per move: QᵀMQ = T with T block-tridiagonal (bandwidth b).  All
     the O(n³) work is in MXU-friendly GEMMs (panel QR via ``geqrf``,
     compact-WY two-sided updates).
  2. ``band_logdet_q``   — per evaluation: since Q is orthogonal and
     acts as the identity on padded coordinates (see below),
     Qᵀ K Q = amp2·T + diag(dadd), a banded SPD matrix whose
     block-tridiagonal Cholesky runs in nb = n/b sequential steps of
     b×b ops — logdet and the quadratic form rᵀK⁻¹r come out of the
     same scan (r̃ = Qᵀr is assembled per evaluation from the
     precomputed Qᵀy and Qᵀmask, so the varying mean costs nothing).

Why diag(dadd) survives the congruence intact (the correctness load-
bearing argument): dadd = where(mask, noise, 1) is CONSTANT on real
rows and constant on padded rows, and ``unit_cov_matrix`` zeroes padded
rows/cols of M *exactly*.  With the mask contiguous (real observations
first — how every engine builds its padded arrays), each Householder
panel column has exact zeros at padded positions, so every reflector
has zero padded components (0·x = 0 exactly in fp), Q is block-diagonal
with identity on the padded block, and Qᵀdiag(dadd)Q = diag(dadd)
exactly.  A NON-contiguous mask would break this silently — callers
must gate on contiguity (the choosers build masks as arange(pad) < n).

The spectral version of this trick (full eigendecomposition, O(n) per
eval) was built in r2 and deleted in r3: batched ``eigh`` at
[10, 5120, 5120] measured 21.35 s on v5e — 340× the Cholesky it
amortizes.  Band reduction keeps the same per-eval win at a reduction
cost that is pure GEMMs (docs/ROADMAP.md item 1, second bullet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

HP = lax.Precision.HIGHEST

try:  # geqrf (Householder QR with raw V/τ output) moved out of the
    # public lax.linalg namespace in newer JAX; fall back to a pure-JAX
    # column scan if it disappears entirely.
    from jax._src.lax.linalg import geqrf as _geqrf
except ImportError:  # pragma: no cover
    _geqrf = None


def _householder_qr_scan(panel: jnp.ndarray):
    """Pure-JAX unblocked Householder QR of one panel (geqrf fallback).

    Returns (vt, taus) with geqrf conventions: R in the upper triangle
    of vt, unit-top Householder vectors below the diagonal, τ=0 for
    already-zero columns.  H_j = I − τ_j v_j v_jᵀ with v_j[j] = 1,
    v_j = (x + sign(x₁)‖x‖e₁)/(x₁ + sign(x₁)‖x‖), τ = (|x₁|+‖x‖)/‖x‖.
    """
    m, b = panel.shape
    rows = jnp.arange(m)
    cols = jnp.arange(b)

    def step(a, j):
        x = jnp.where(rows >= j, a[:, j], 0.0)
        x1 = a[j, j]
        normx = jnp.sqrt(jnp.sum(x * x, dtype=a.dtype))
        zero = normx <= 0.0
        sign = jnp.where(x1 >= 0.0, 1.0, -1.0).astype(a.dtype)
        v1 = x1 + sign * normx
        v1_safe = jnp.where(zero | (v1 == 0.0), 1.0, v1)
        v = jnp.where(rows > j, x / v1_safe, 0.0)
        v = v.at[j].set(jnp.where(zero, 0.0, 1.0))
        tau = jnp.where(zero, 0.0,
                        (jnp.abs(x1) + normx)
                        / jnp.where(zero, 1.0, normx))
        # reflect columns ≥ j only (columns < j hold stored v's)
        w = jnp.matmul(v, a, precision=HP)          # [b]
        upd = tau * jnp.outer(v, w)
        a = a - jnp.where(cols[None, :] >= j, upd, 0.0)
        # store v below the diagonal of column j (R entry stays on/above)
        a = a.at[:, j].set(jnp.where(rows > j, v, a[:, j]))
        return a, tau

    a, taus = lax.scan(step, panel, cols)
    return a, taus


def _panel_wy(panel: jnp.ndarray):
    """QR-factor a panel and return its compact-WY block reflector.

    panel: [m, b] (m ≥ b).  Returns (r, v, t) with
      Q = H_1…H_b = I − V T Vᵀ,   Qᵀ panel = [R; 0],
    R [b, b] upper-triangular, V [m, b] unit-lower-trapezoidal, T
    [b, b] upper-triangular.  Zero-tau columns (LAPACK convention for
    already-zero columns, e.g. padded observation columns) contribute
    an identity reflector: their T row/col is exactly zero.
    """
    m, b = panel.shape
    if _geqrf is not None:
        vt, taus = _geqrf(panel)
    else:  # pragma: no cover
        vt, taus = _householder_qr_scan(panel)
    r = jnp.triu(vt[:b])
    v = jnp.tril(vt, -1) + jnp.eye(m, b, dtype=panel.dtype)
    # T from the inverse of U = diag(1/τ) + strict-upper(VᵀV)
    # (larft identity; verified in tests against the sequential
    # reflector product).  τ=0 columns are decoupled before the
    # inversion and masked after it.
    live = taus > 0
    tau_safe = jnp.where(live, taus, 1.0)
    g = jnp.matmul(v.T, v, precision=HP)
    outer_live = live[:, None] & live[None, :]
    u = jnp.where(outer_live, jnp.triu(g, 1), 0.0) + jnp.diag(1.0 / tau_safe)
    t = lax.linalg.triangular_solve(
        u, jnp.eye(b, dtype=panel.dtype), left_side=True, lower=False)
    t = jnp.where(outer_live, t, 0.0)
    return r, v, t


def reduce_to_band(m0: jnp.ndarray, vecs: jnp.ndarray, block: int = 128):
    """One-stage blocked Householder reduction to bandwidth ``block``.

    m0: [n, n] symmetric (padded rows/cols exactly zero — see module
    docstring), vecs: [n, V] columns to co-transform by Qᵀ.
    n % block == 0 required.  Returns

      d_blocks  [nb, b, b]   diagonal blocks of T = QᵀM Q
      s_blocks  [nb, b, b]   subdiagonal blocks (s_blocks[i] is the
                             (i+1, i) block; index nb−1 is zero padding
                             so the eval scan stays rectangular)
      vecs_t    [n, V]       Qᵀ vecs

    Panels run k = 0..nb−3 (the last two block rows are within the band
    already); each step QRs the sub-panel below the band and applies
    the block reflector two-sided to the trailing matrix with three
    GEMMs — ~2n³ flops total, MXU-resident, vs the O(n³) the fused
    kernel pays on EVERY joint-move evaluation.
    """
    n = m0.shape[-1]
    b = block
    assert n % b == 0, (n, b)
    nb = n // b
    dtype = m0.dtype

    d_out, s_out, v_out = [], [], []
    trail = m0
    vt = vecs
    for k in range(max(nb - 2, 0)):
        d_out.append(trail[:b, :b])
        panel = trail[b:, :b]                       # [m, b]
        r, v, t = _panel_wy(panel)
        s_out.append(r)                             # (k+1, k) block = R
        a22 = trail[b:, b:]                         # [m, m]
        y = jnp.matmul(a22, v, precision=HP)        # [m, b]
        s2 = jnp.matmul(v.T, y, precision=HP)       # [b, b]
        tst = jnp.matmul(t.T, jnp.matmul(s2, t, precision=HP),
                         precision=HP)
        w = jnp.matmul(y, t, precision=HP) - 0.5 * jnp.matmul(
            v, tst, precision=HP)                   # [m, b]
        trail = (a22 - jnp.matmul(w, v.T, precision=HP)
                 - jnp.matmul(v, w.T, precision=HP))
        # vectors: Qᵀ x = x − V Tᵀ (Vᵀ x)
        tail = vt[b:]
        tvx = jnp.matmul(t.T, jnp.matmul(v.T, tail, precision=HP),
                         precision=HP)
        v_out.append(vt[:b])
        vt = tail - jnp.matmul(v, tvx, precision=HP)

    # remnant: the last ≤2 block rows are already within the band
    rem = trail.shape[0] // b
    for j in range(rem):
        d_out.append(trail[j * b:(j + 1) * b, j * b:(j + 1) * b])
        if j + 1 < rem:
            s_out.append(trail[(j + 1) * b:(j + 2) * b, j * b:(j + 1) * b])
        v_out.append(vt[j * b:(j + 1) * b])
    s_out.append(jnp.zeros((b, b), dtype))          # rectangular padding

    return (jnp.stack(d_out), jnp.stack(s_out), jnp.concatenate(v_out))


def band_logdet_q(d_blocks: jnp.ndarray, s_blocks: jnp.ndarray,
                  amp2: jnp.ndarray, dadd: jnp.ndarray,
                  resid: jnp.ndarray):
    """(Σ log diag L, rᵀK⁻¹r) of K = amp2·T + diag(dadd), T banded.

    d_blocks/s_blocks from ``reduce_to_band``; dadd, resid: [n] in the
    REDUCED basis (resid = Qᵀ(y − mean·1) assembled by the caller from
    the co-transformed vectors; dadd is basis-invariant — see module
    docstring).  Block-tridiagonal Cholesky in one scan: nb sequential
    steps of {b×b Cholesky, two triangular solves, one rank-b update},
    O(n·b²) total — the per-evaluation replacement for the fused
    O(n³) factorization inside the joint slice move.  A failed
    factorization yields NaN outputs (callers map to −inf exactly like
    the dense path).
    """
    nb, b, _ = d_blocks.shape
    dadd_b = dadd.reshape(nb, b)
    r_b = resid.reshape(nb, b)
    eyeb = jnp.eye(b, dtype=d_blocks.dtype)

    def step(carry, inp):
        c_prev, z_prev, ld, q = carry
        d_i, s_i, da_i, r_i = inp
        s = amp2 * d_i + da_i * eyeb - jnp.matmul(
            c_prev, c_prev.T, precision=HP)
        l_i = jnp.linalg.cholesky(s)
        rhs = r_i - jnp.matmul(c_prev, z_prev, precision=HP)
        z_i = lax.linalg.triangular_solve(
            l_i, rhs[:, None], left_side=True, lower=True)[:, 0]
        # C_i = amp2·S_i · L_i⁻ᵀ  (S_i the (i+1, i) band block)
        c_i = lax.linalg.triangular_solve(
            l_i, amp2 * s_i.T, left_side=True, lower=True).T
        ld = ld + jnp.sum(jnp.log(jnp.diagonal(l_i)))
        q = q + jnp.dot(z_i, z_i, precision=HP)
        return (c_i, z_i, ld, q), None

    zero = jnp.zeros((), d_blocks.dtype)
    init = (jnp.zeros((b, b), d_blocks.dtype),
            jnp.zeros((b,), d_blocks.dtype), zero, zero)
    (_, _, ld, q), _ = lax.scan(step, init,
                                (d_blocks, s_blocks, dadd_b, r_b))
    return ld, q


def _chol_small(a):
    """Serial Cholesky of a [..., b, b] SPD value (value-level, XLA).

    The same two-vector-pass column recurrence as the fused kernel's
    ``_factor_base`` (ops/pallas_gp.py) with ``dynamic_slice`` column
    extraction instead of the in-kernel lane roll.  Returns (L, d) with
    d the [..., b] diagonal pivots; half-logdet = Σ log d.  The batch
    dims flatten chains × blocks, so cyclic reduction factors EVERY
    eliminated block of a level in one b-column sweep.
    """
    b = a.shape[-1]
    dtype = a.dtype
    lanes = lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def one_col(j, carry):
        a, dvec = carry
        col = lax.dynamic_slice_in_dim(a, j, 1, axis=-1)[..., 0]
        d2 = lax.dynamic_slice_in_dim(col, j, 1, axis=-1)[..., 0]
        inv_d = lax.rsqrt(d2)
        d = d2 * inv_d
        onev = (lanes == j).astype(dtype)[0]
        below = (lanes >= j).astype(dtype)[0]
        l = col * inv_d[..., None] * below
        a = a + l[..., :, None] * (onev - l)[..., None, :]
        dvec = dvec + d[..., None] * onev
        return a, dvec

    init = (a, jnp.zeros(a.shape[:-1], dtype))
    return lax.fori_loop(0, b, one_col, init, unroll=4)


def _tri_inv_small(lmat, dvec, newton: int = 1):
    """[..., b, b] lower-triangular inverse by nilpotent repeated
    squaring (the fused kernel's ``_tri_inv_sq`` algebra): L = (I+S)D,
    (I+S)⁻¹ = Σ(−S)^k in ⌈log₂ b⌉ MXU doublings — no substitution
    loop, so the cyclic-reduction solves become pure GEMMs.

    ``newton`` refinement steps X ← X(2I − LX) square the residual
    away: the raw doubling accumulates ~cond(L)·ε over log₂ b GEMMs,
    which at the 1e-6-jitter small-n regime (no _effective_jitter
    floor) was measured drifting the CR marginal ~1 nat off the
    substitution path; one step restores substitution-grade accuracy
    for two extra GEMMs per level.
    """
    b = lmat.shape[-1]
    dtype = lmat.dtype
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    strict = (rows > cols).astype(dtype)
    eye = (rows == cols).astype(dtype)
    inv_d = 1.0 / dvec
    neg_s = -(lmat * strict) * inv_d[..., None, :]
    y = eye + neg_s
    p = neg_s
    for _ in range(max(0, (b - 1).bit_length() - 1)):
        p = jnp.matmul(p, p, precision=HP)
        y = y + jnp.matmul(y, p, precision=HP)
    x = y * inv_d[..., :, None]
    ltri = lmat * (strict + eye)   # masked lower triangle (diag = dvec)
    for _ in range(newton):
        lx = jnp.matmul(ltri, x, precision=HP)
        x = x + jnp.matmul(x, eye - lx, precision=HP)
    return x


def cr_logdet_q(d_blocks: jnp.ndarray, s_blocks: jnp.ndarray,
                amp2: jnp.ndarray, dadd: jnp.ndarray,
                resid: jnp.ndarray):
    """Block CYCLIC REDUCTION evaluation of K = amp2·T + diag(dadd).

    Same contract as ``band_logdet_q`` but log₂(nb) levels deep instead
    of nb sequential steps: at each level every ODD block row is
    eliminated simultaneously (they are mutually uncoupled in a block
    tridiagonal), which is symmetric block Gaussian elimination under a
    nested-dissection permutation — exact, SPD-stable, and
    det-preserving:

        logdet K = Σ_levels Σ_odd logdet(A_i) + logdet(final block)
        rᵀK⁻¹r  = Σ_levels Σ_odd ‖L_i⁻¹r_i‖² + ‖L_f⁻¹r_f‖²

    with the even neighbors Schur-updated per level.  Each level is ONE
    b-column Cholesky sweep batched over all (chains × odd blocks) plus
    MXU GEMMs — total sequential column count b·log₂(nb) vs the scan's
    n, which is what the TPU's per-op issue latency actually prices
    (~6 µs/column, batch-size-invariant; docs/PROFILE_r4.md).

    nb must be a power of two ≥ 2 — callers pad with inert identity
    blocks (A=I, B=0, r=0: zero logdet/quad contribution).
    """
    nb, b, _ = d_blocks.shape
    assert nb & (nb - 1) == 0 and nb >= 2, nb
    eyeb = jnp.eye(b, dtype=d_blocks.dtype)
    a = amp2 * d_blocks + dadd.reshape(nb, b)[:, :, None] * eyeb
    bb = amp2 * s_blocks            # bb[i] couples block i+1 ← i
    r = resid.reshape(nb, b)
    ld, q = _cr_body(a[None], bb[None], r[None], newton=1,
                     chol_fn=_chol_small)
    return ld[0], q[0]


def _shift_down(x):
    """x[:, i] → slot i+1, zero into slot 0 (concat, Mosaic-friendly —
    no zero-sized slices: a single-slot level shifts to all-zero)."""
    if x.shape[1] == 1:
        return jnp.zeros_like(x)
    zero = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([zero, x[:, :-1]], axis=1)


def _cr_body(a, bb, r, newton, chol_fn):
    """The cyclic-reduction recursion on VALUES, shared by the XLA
    evaluator and the Mosaic kernel (whole batch resident in VMEM).
    a: [K, m, b, b] assembled diagonal blocks, bb: [K, m, b, b]
    subdiagonal blocks (bb[:, i]: block i+1 ← i, last slot zero),
    r: [K, m, b].  ``chol_fn``: [G, b, b] → (L, d) — ``_chol_small``
    under XLA, the fused kernel's lane-roll ``_factor_base`` in-kernel.
    Returns (ld [K], q [K])."""
    k_batch, m, b, _ = a.shape
    # accumulators stay 2-D: Mosaic's vector layouts reject rank-1
    # values (observed compiler check-failure on [K] accumulators)
    ld = jnp.zeros((k_batch, 1), a.dtype)
    q = jnp.zeros((k_batch, 1), a.dtype)

    def fact(blocks):
        """chol + inverse of [K, h, b, b], flattened so the serial
        b-column sweep is paid ONCE for all chains × blocks."""
        h = blocks.shape[1]
        flat = blocks.reshape(k_batch * h, b, b)
        lmat, dpiv = chol_fn(flat)
        linv = _tri_inv_small(lmat, dpiv, newton=newton)
        return (dpiv.reshape(k_batch, h, b),
                linv.reshape(k_batch, h, b, b))

    def mm(lhs, rhs):
        # Mosaic's tpu.matmul supports at most ONE batch dim — all CR
        # GEMMs run on (chains × blocks)-flattened [G, b, ·] operands.
        return jnp.matmul(lhs, rhs, precision=HP)

    while m > 1:
        h = m // 2
        g_flat = k_batch * h
        a2 = a.reshape(k_batch, h, 2, b, b)
        b2 = bb.reshape(k_batch, h, 2, b, b)
        r2 = r.reshape(k_batch, h, 2, b)
        a_od, a_ev = a2[:, :, 1], a2[:, :, 0]
        b_left = b2[:, :, 0].reshape(g_flat, b, b)
        b_right = b2[:, :, 1].reshape(g_flat, b, b)
        r_od, r_ev = r2[:, :, 1].reshape(g_flat, b), r2[:, :, 0]

        dpiv, linv = fact(a_od)
        linv = linv.reshape(g_flat, b, b)
        g1 = mm(linv, b_left)
        g2 = mm(linv, jnp.swapaxes(b_right, -1, -2))
        g = mm(linv, r_od[..., None])[..., 0]
        ld = ld + jnp.sum(jnp.log(dpiv).reshape(k_batch, h * b),
                          axis=1, keepdims=True)
        q = q + jnp.sum((g * g).reshape(k_batch, h * b), axis=1,
                        keepdims=True)

        upd_l = mm(jnp.swapaxes(g1, -1, -2), g1)
        upd_r = mm(jnp.swapaxes(g2, -1, -2), g2)
        rl = mm(jnp.swapaxes(g1, -1, -2), g[..., None])[..., 0]
        rr = mm(jnp.swapaxes(g2, -1, -2), g[..., None])[..., 0]
        a_ev = (a_ev - upd_l.reshape(k_batch, h, b, b)
                - _shift_down(upd_r.reshape(k_batch, h, b, b)))
        r_ev = (r_ev - rl.reshape(k_batch, h, b)
                - _shift_down(rr.reshape(k_batch, h, b)))
        # new even↔even coupling through the eliminated odd block
        # (last slot stays zero: bb[:, m-1] is always the zero pad)
        bb = mm(jnp.swapaxes(g2, -1, -2), -g1).reshape(k_batch, h, b, b)
        a, r, m = a_ev, r_ev, h

    dpiv, linv = fact(a)
    g = mm(linv.reshape(k_batch, b, b), r.reshape(k_batch, b, 1))[..., 0]
    ld = ld + jnp.sum(jnp.log(dpiv).reshape(k_batch, b), axis=1,
                      keepdims=True)
    q = q + jnp.sum(g * g, axis=1, keepdims=True)
    return ld[:, 0], q[:, 0]


def cr_logdet_q_pallas(a, bb, r, newton: int = 1,
                       interpret: bool | None = None):
    """Mosaic cyclic-reduction evaluator: the whole batched recursion
    (_cr_body) in one kernel, so the b·log₂(nb) serial columns pay the
    in-kernel ~6 µs/column issue cost instead of XLA's ~50 µs/op loop
    overhead (the XLA-level evaluator measured 65 ms at the flagship
    shape — slower than the sequential scan; docs/PROFILE_r5.md).

    a: [K, m, b, b] ASSEMBLED diagonal blocks amp2·D + diag(dadd)
    (assembly is one cheap XLA elementwise pass), bb: [K, m, b, b]
    scaled subdiagonal blocks, r: [K, m·b].  m must be a power of two
    (inert-padded).  Returns (ld [K], q [K]).  Everything lives in
    VMEM: 2·K·m·b² f32 ≈ 40 MB at the flagship shape plus the
    recursion's transients — v5e budgets 128 MB.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spearmint_tpu.ops import pallas_gp as pg

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_batch, m, b, _ = a.shape

    def kernel(a_ref, bb_ref, r_ref, out_ref):
        ld, q = _cr_body(a_ref[:], bb_ref[:],
                         r_ref[:].reshape(k_batch, m, b), newton,
                         chol_fn=pg._factor_base)
        out_ref[:] = jnp.concatenate([ld[:, None], q[:, None]], axis=1)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_batch, 2), a.dtype),
        in_specs=[vmem] * 3,
        out_specs=vmem,
        interpret=pg._interpret_params() if interpret else False,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(a, bb, r)
    return out[:, 0], out[:, 1]


@jax.custom_batching.custom_vmap
def cr_eval(d_blocks, s_blocks, amp2, dadd, resid):
    """(ld, q) of amp2·T + diag(dadd) by cyclic reduction — ONE chain.

    The custom_vmap rule batches the whole call: a chains-vmapped joint
    move dispatches every chain's evaluation into one Mosaic kernel
    (cr_logdet_q_pallas) on TPU — the same batching pattern as
    linalg.fma_logdet_q — or one batched XLA recursion elsewhere.
    """
    return cr_logdet_q(d_blocks, s_blocks, amp2, dadd, resid)


def _cr_assemble(d_blocks, s_blocks, amp2, dadd, resid):
    """[K,...] batched assembly of the CR inputs (one XLA pass)."""
    k_batch, m, b, _ = d_blocks.shape
    eyeb = jnp.eye(b, dtype=d_blocks.dtype)
    a = (amp2[:, None, None, None] * d_blocks
         + dadd.reshape(k_batch, m, b)[..., None] * eyeb)
    bb = amp2[:, None, None, None] * s_blocks
    return a, bb


def _cr_pallas_fits(k_batch, m, b) -> bool:
    # two [K, m, b, b] f32 residents + recursion transients ≤ ~90 MB
    return 2 * 4 * k_batch * m * b * b <= 90 * 1024 * 1024


# Mosaic-kernel dispatch gate for the batched CR evaluation.  DEFAULT
# OFF: the kernel is interpret-mode-correct but HANGS the current
# toolchain's Mosaic compile on real hardware at every shape tried
# (docs/PROFILE_r5.md §1) — with the flag off, a TPU band-mode opt-in
# degrades to the (slower but terminating) XLA recursion instead of
# wedging the chip.  Flip on a toolchain that compiles it.
CR_PALLAS = False


@cr_eval.def_vmap
def _cr_eval_vmap(axis_size, in_batched, d_blocks, s_blocks, amp2, dadd,
                  resid):
    args = [d_blocks, s_blocks, amp2, dadd, resid]
    args = [a if ab else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, ab in zip(args, in_batched)]
    d_blocks, s_blocks, amp2, dadd, resid = args
    k_batch, m, b, _ = d_blocks.shape
    a, bb = _cr_assemble(d_blocks, s_blocks, amp2, dadd, resid)
    if (CR_PALLAS and jax.default_backend() == "tpu"
            and _cr_pallas_fits(k_batch, m, b) and b % 4 == 0):
        ld, q = cr_logdet_q_pallas(a, bb, resid)
    else:
        ld, q = _cr_body(a, bb, resid.reshape(k_batch, m, b), 1,
                         _chol_small)
    return (ld, q), (True, True)


def band_marginal_factory(x, y, mask, ls, kernel, block: int = 128,
                          use_cr: bool | None = None):
    """Precompute the per-move reduction and return an O(n·b²) marginal.

    Returns ``marginal(mean, amp2, noise) -> lp`` evaluating the exact
    GP log marginal (reference formula, core/likelihood.log_marginal
    semantics, NaN→−inf) through the banded form.  Call once per joint
    move (ls fixed); the closure is what the slice sampler evaluates.
    ``use_cr`` routes evaluations through the log-depth cyclic-
    reduction evaluator (the production path — the sequential scan's
    nb × ~1 ms op-issue latency made it break even against the fused
    dense kernel, docs/PROFILE_r5.md); the scan evaluator remains as
    the reference implementation for tests.  Default (None): CR at
    pads ≥ 2048 — where ``_effective_jitter`` floors the condition
    number, bounding the explicit-inverse algebra's O(cond·ε) drift at
    the same ~1e-4 level as the fused kernel's own block inverses —
    and the substitution scan below.
    """
    from spearmint_tpu.core.likelihood import unit_cov_matrix

    if use_cr is None:
        use_cr = x.shape[0] >= 2048

    m0 = unit_cov_matrix(x, mask, ls, kernel)
    fmask = mask.astype(x.dtype)
    vecs = jnp.stack([jnp.where(mask, y, 0.0), fmask], axis=1)
    d_blocks, s_blocks, vt = reduce_to_band(m0, vecs, block)
    uy, um = vt[:, 0], vt[:, 1]

    if use_cr:
        nb = d_blocks.shape[0]
        mb = max(2, 1 << (nb - 1).bit_length())
        ext = mb * block - nb * block
        uy = jnp.concatenate([uy, jnp.zeros((ext,), uy.dtype)])
        um = jnp.concatenate([um, jnp.zeros((ext,), um.dtype)])
        mask_e = jnp.concatenate([mask, jnp.zeros((ext,), bool)])
        zb = jnp.zeros((mb - nb, block, block), d_blocks.dtype)
        d_blocks = jnp.concatenate([d_blocks, zb])
        s_blocks = jnp.concatenate([s_blocks, zb])
        eval_fn, mask_use = cr_eval, mask_e
    else:
        eval_fn, mask_use = band_logdet_q, mask

    def marginal(mean, amp2, noise):
        dadd = jnp.where(mask_use, noise, jnp.asarray(1.0, x.dtype))
        resid = uy - mean * um
        ld, q = eval_fn(d_blocks, s_blocks, amp2, dadd, resid)
        lp = -ld - 0.5 * q
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    return marginal
