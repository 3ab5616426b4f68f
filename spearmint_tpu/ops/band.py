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


def _panel_wy(panel: jnp.ndarray, eps: float = 0.0):
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


def band_marginal_factory(x, y, mask, ls, kernel, block: int = 128):
    """Precompute the per-move reduction and return an O(n·b²) marginal.

    Returns ``marginal(mean, amp2, noise) -> lp`` evaluating the exact
    GP log marginal (reference formula, core/likelihood.log_marginal
    semantics, NaN→−inf) through the banded form.  Call once per joint
    move (ls fixed); the closure is what the slice sampler evaluates.
    """
    from spearmint_tpu.core.likelihood import unit_cov_matrix

    m0 = unit_cov_matrix(x, mask, ls, kernel)
    fmask = mask.astype(x.dtype)
    vecs = jnp.stack([jnp.where(mask, y, 0.0), fmask], axis=1)
    d_blocks, s_blocks, vt = reduce_to_band(m0, vecs, block)
    uy, um = vt[:, 0], vt[:, 1]

    def marginal(mean, amp2, noise):
        dadd = jnp.where(mask, noise, jnp.asarray(1.0, x.dtype))
        resid = uy - mean * um
        ld, q = band_logdet_q(d_blocks, s_blocks, amp2, dadd, resid)
        lp = -ld - 0.5 * q
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    return marginal
