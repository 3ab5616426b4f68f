"""Masked dense linear algebra for fixed-shape (padded) GP computations.

JAX/XLA wants static shapes; the reference grows its observation arrays
dynamically (``GPEIOptChooser.py`` rebuilds an (n,n) kernel matrix each
call).  Here every array is padded to a bucket size and carries a boolean
mask.  The masking scheme makes padded entries *exactly* inert:

  * kernel matrix rows/cols for padded points are replaced by identity
    rows → the Cholesky factor is block diagonal with 1s on the padded
    diagonal, contributing 0 to the log determinant;
  * padded residual entries are 0 → triangular solves propagate exact 0s,
    so quadratic forms and posterior projections are unaffected.

So a masked computation at bucket size N equals the unmasked computation
at the true size n, bit-for-bit up to XLA reduction order.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def cholesky(k: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky (XLA's).

    (A per-panel Pallas/XLA hybrid Cholesky backend shipped env-gated
    in r2-r3 and was retired in r4: measured net-negative in-sweep
    twice — r2 >25 min compile, r3 9.97 s vs 2.16 s flagship — and its
    isolated-MXU advantage is subsumed by the fused whole-evaluation
    kernel in ops/pallas_gp, which is where standalone factorizations
    went.  See docs/PROFILE_r4.md.)
    """
    return jnp.linalg.cholesky(k)


def pad_bucket(n: int, minimum: int = 16) -> int:
    """Static-shape bucket for n observations.

    Buckets are powers of two plus their quarter midpoints (16, 20, 24,
    28, 32, 40, 48, 56, 64, ...): recompilation count stays O(log n)
    while padding waste is ≤ 25% linear — which matters cubed through
    the Cholesky (n=5000 pads to 5120, not the old 1.5×-midpoint 6144:
    1.73× fewer chol FLOPs, and the batched Cholesky is the measured
    flagship bottleneck — see docs/PROFILE_r3.md).  Tradeoff: 4 buckets
    per octave vs the old 2, so a growing experiment crosses twice as
    many shape buckets and pays twice as many full jit recompiles of
    the suggest step (~20-40 s each, amortized over an experiment's
    lifetime of suggestions).  Every bucket ≥ 512
    is a multiple of 128 (MXU tile) and of any power-of-two device
    count ≤ 32 (obs-mesh divisibility in the chooser's `use_obs` gate).
    """
    b = minimum
    while True:
        if n <= b:
            return b
        for num in (5, 6, 7):
            if n <= (b * num) // 4:
                return (b * num) // 4
        b *= 2


def pend_pad(obs_pad: int, p: int, minimum: int = 4) -> int:
    """Static pad for P pending points.

    When the observation pad is fused-kernel-eligible (≥512,
    128-aligned), pending pads to a multiple of 128 so the AUGMENTED
    (obs_pad + pend_pad) fantasy factorization stays on the fused
    Pallas route (the ¼-midpoint buckets like 160 would break the
    alignment); otherwise the ordinary bucket ladder applies.  One
    definition shared by the choosers and bench so the eligibility
    invariant cannot drift between call sites.
    """
    if p > 0 and obs_pad >= 512 and obs_pad % 128 == 0:
        return -(-p // 128) * 128
    return max(minimum, pad_bucket(max(p, 1), minimum=minimum))


def mask_psd_matrix(k: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace padded rows/cols of a PSD matrix with identity rows.

    k: (N, N) raw kernel matrix (padded entries arbitrary).
    mask: (N,) boolean, True for real observations.
    """
    both = mask[:, None] & mask[None, :]
    eye = jnp.eye(k.shape[-1], dtype=k.dtype)
    return jnp.where(both, k, eye)


def masked_cholesky(k: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a masked PSD matrix."""
    return cholesky(mask_psd_matrix(k, mask))


def tri_inverse(chol: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Explicit L⁻¹ of a lower-triangular matrix, RHS-chunked.

    A single triangular_solve against the full N×N identity makes XLA
    keep every blocked-solve intermediate live at once (observed: 35 GB
    of [B, N−k·128, N] temps at B=10, N=6144 → compile-time OOM).
    ``lax.map`` over identity column chunks bounds the live set to one
    [..., N, chunk] chain while the factor stays resident.
    """
    n = chol.shape[-1]
    if n <= chunk:
        eye = jnp.eye(n, dtype=chol.dtype)
        return jax.lax.linalg.triangular_solve(
            chol, jnp.broadcast_to(eye, chol.shape),
            left_side=True, lower=True)
    n_chunks = -(-n // chunk)
    padded = n_chunks * chunk
    eye = jnp.eye(n, padded, dtype=chol.dtype)          # [N, padded]
    cols = jnp.moveaxis(eye.reshape(n, n_chunks, chunk), 1, 0)

    def solve_chunk(e):
        b = jnp.broadcast_to(e, chol.shape[:-2] + e.shape)
        return jax.lax.linalg.triangular_solve(
            chol, b, left_side=True, lower=True)

    out = jax.lax.map(solve_chunk, cols)   # [chunks, ..., N, chunk]
    out = jnp.moveaxis(out, 0, -2)         # [..., N, chunks, chunk]
    out = out.reshape(out.shape[:-2] + (padded,))
    return out[..., :n]


def chol_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = b given K = L Lᵀ (reference ``spla.cho_solve``)."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def tri_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b (lower-triangular forward substitution)."""
    return jax.scipy.linalg.solve_triangular(chol, b, lower=True)


# Blocked single-RHS forward substitution.  XLA's triangular_solve with
# one right-hand side serializes N scalar substitution steps inside its
# panels (~21 ms at N=5120 on v5e — latency-, not bandwidth-bound, the
# hot-loop cost per slice evaluation after the one-solve change).  This
# version pre-inverts the (N/B) diagonal blocks with ONE batched
# triangular solve (sequential depth B instead of N), then runs N/B
# scan steps of [B, N]·[N] matvec + [B, B]·[B] — sequential depth
# B + N/B ≈ 276 vs 5120 at B=256.
_TRI_BLOCK = 256


def tri_solve_blocked(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b for a single RHS vector b of length N.

    Exact same quantity as ``tri_solve`` (different floating-point
    association inside blocks).  Requires N % _TRI_BLOCK == 0; callers
    fall back to ``tri_solve`` otherwise.
    """
    n = chol.shape[-1]
    nb = n // _TRI_BLOCK
    bs = _TRI_BLOCK

    # [nb, B, B] diagonal blocks, inverted by one batched solve
    starts = jnp.arange(nb) * bs
    dblocks = jax.vmap(
        lambda i: jax.lax.dynamic_slice(chol, (i, i), (bs, bs))
    )(starts)
    eye = jnp.eye(bs, dtype=chol.dtype)
    dinv = jax.lax.linalg.triangular_solve(
        dblocks, jnp.broadcast_to(eye, (nb, bs, bs)),
        left_side=True, lower=True,
    )

    rows = chol.reshape(nb, bs, n)  # [i]: rows i·B..(i+1)·B, full width
    bvec = b.reshape(nb, bs)

    def step(w, i):
        # w holds solved entries (zeros ahead of the frontier), so the
        # full-width matvec picks up exactly the j < i block columns
        # (block i's own columns multiply zeros; cols > i are zero in L).
        hp = jax.lax.Precision.HIGHEST
        s = jnp.matmul(rows[i], w, precision=hp)
        wi = jnp.matmul(dinv[i], bvec[i] - s, precision=hp)
        w = jax.lax.dynamic_update_slice(w, wi, (i * bs,))
        return w, None

    w, _ = jax.lax.scan(step, jnp.zeros_like(b), jnp.arange(nb))
    return w


def tri_solve_1rhs(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Single-RHS forward solve, blocked when the shape allows."""
    n = chol.shape[-1]
    if n >= 1024 and n % _TRI_BLOCK == 0:
        return tri_solve_blocked(chol, b)
    return tri_solve(chol, b)


def logdet_from_chol(chol: jnp.ndarray) -> jnp.ndarray:
    """½ log det K = Σ log diag(L).  Padded diagonal entries are 1 → 0."""
    return jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)))


# Fused logdet+quadratic backend switch (ops/pallas_gp): the whole
# slice-evaluation pipeline — blocked Cholesky, Σ log diag, and the
# in-factorization solve of ‖L⁻¹r‖² — as ONE Pallas kernel.  Trace-time
# flag; TPU-only (the dispatch checks backend and shape).
_FUSED_LOGDET_Q = os.environ.get("SPEARMINT_TPU_FUSED_CHOL", "1") == "1"


def set_fused_logdet_q(on: bool) -> None:
    """Toggle the fused Pallas backend for chol_logdet_q/fma_logdet_q.

    Trace-time flag: functions already jit-compiled keep whichever path
    they traced — their cache key does not include this flag — so
    toggling only affects NEW traces (new shapes/configs, or after
    ``jax.clear_caches()``).
    """
    global _FUSED_LOGDET_Q
    _FUSED_LOGDET_Q = bool(on)


def _fused_ok(n: int) -> bool:
    if not _FUSED_LOGDET_Q:
        return False
    from spearmint_tpu.ops import pallas_gp

    return pallas_gp.supported(n)


@jax.custom_batching.custom_vmap
def chol_logdet_q(k: jnp.ndarray, resid: jnp.ndarray):
    """(Σ log diag chol(K), rᵀK⁻¹r) — the slice-sampling hot call.

    k: (N, N) PSD (masked-padded), resid: (N,).  On TPU at supported
    shapes this fuses factorization, log-determinant and the
    in-factorization forward solve into one Pallas kernel
    (ops/pallas_gp); elsewhere it is exactly the XLA sequence the
    engine always used (cholesky → tri_solve_1rhs → logdet), so CPU
    goldens are bit-identical.  The custom_vmap rule batches the whole
    call (a leading chains axis) instead of letting vmap enter the
    kernel.  Not differentiable on the fused path (slice sampling is
    derivative-free; EI gradients use the posterior caches instead).
    """
    if _fused_ok(k.shape[-1]):
        from spearmint_tpu.ops.pallas_gp import logdet_q_pallas

        ld, q = logdet_q_pallas(k[None], resid[None])
        return ld[0], q[0]
    chol = cholesky(k)
    w = tri_solve_1rhs(chol, resid)
    return logdet_from_chol(chol), jnp.dot(w, w)


@chol_logdet_q.def_vmap
def _chol_logdet_q_vmap(axis_size, in_batched, k, resid):
    kb, rb = in_batched
    if not kb:
        k = jnp.broadcast_to(k, (axis_size,) + k.shape)
    if not rb:
        resid = jnp.broadcast_to(resid, (axis_size,) + resid.shape)
    if _fused_ok(k.shape[-1]):
        from spearmint_tpu.ops.pallas_gp import logdet_q_pallas

        ld, q = logdet_q_pallas(k, resid)
    else:
        chols = cholesky(k)
        w = jax.vmap(tri_solve_1rhs)(chols, resid)
        ld = jax.vmap(logdet_from_chol)(chols)
        q = jnp.sum(w * w, axis=-1)
    return (ld, q), (True, True)


@jax.custom_batching.custom_vmap
def fma_logdet_q(m0: jnp.ndarray, amp2: jnp.ndarray, dadd: jnp.ndarray,
                 resid: jnp.ndarray):
    """``chol_logdet_q(amp2·m0 + diag(dadd), resid)`` without the XLA
    scaling pass: on TPU at supported shapes the diagonal shift happens
    inside the fused kernel as each diagonal tile is first touched and
    the amp2 scale is applied analytically to the two outputs, so XLA
    only assembles the amp2/noise-independent M — every marginal
    evaluation (seed, joint move, ls move) routes through this one
    path (core/likelihood.log_marginal).
    m0: (N, N) unit covariance with padded rows/cols zeroed
    (likelihood.unit_cov_matrix),
    amp2: scalar, dadd: (N,) diagonal additions, resid: (N,).
    """
    if _fused_ok(m0.shape[-1]):
        ld, q = _shifted_rescaled(m0[None], amp2[None], dadd[None],
                                  resid[None])
        return ld[0], q[0]
    k = amp2 * m0 + dadd * jnp.eye(m0.shape[-1], dtype=m0.dtype)
    chol = cholesky(k)
    w = tri_solve_1rhs(chol, resid)
    return logdet_from_chol(chol), jnp.dot(w, w)


def _shifted_rescaled(m0, amp2, dadd, resid):
    """Fused-kernel evaluation of the joint-move form via the shift
    trick: chol(amp2·(M + diag(dadd/amp2))) = √amp2·chol(M + d/amp2), so
    Σ log diag = ld̃ + (N/2)·log amp2 (padded lanes shift by 1/amp2 and
    absorb exactly the remaining (N−n)/2·log amp2 — see ops/pallas_gp)
    and rᵀK⁻¹r = q̃/amp2.  Skips the per-evaluation O(N²) assembly."""
    from spearmint_tpu.ops.pallas_gp import shifted_logdet_q_pallas

    n = m0.shape[-1]
    ld_t, q_t = shifted_logdet_q_pallas(
        m0, dadd / amp2[:, None], resid)
    return ld_t + 0.5 * n * jnp.log(amp2), q_t / amp2


@fma_logdet_q.def_vmap
def _fma_logdet_q_vmap(axis_size, in_batched, m0, amp2, dadd, resid):
    args = [m0, amp2, dadd, resid]
    args = [
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    ]
    m0, amp2, dadd, resid = args
    if _fused_ok(m0.shape[-1]):
        ld, q = _shifted_rescaled(m0, amp2, dadd, resid)
    else:
        eye = jnp.eye(m0.shape[-1], dtype=m0.dtype)
        k = amp2[:, None, None] * m0 + dadd[:, :, None] * eye
        chols = cholesky(k)
        w = jax.vmap(tri_solve_1rhs)(chols, resid)
        ld = jax.vmap(logdet_from_chol)(chols)
        q = jnp.sum(w * w, axis=-1)
    return (ld, q), (True, True)


@jax.custom_batching.custom_vmap
def cache_factor(m0: jnp.ndarray, amp2: jnp.ndarray, dadd: jnp.ndarray,
                 resid: jnp.ndarray):
    """(L, L⁻¹, K⁻¹ resid) for K = amp2·m0 + diag(dadd) — the
    posterior-cache factorization bundle.

    m0: (N, N) unit covariance (likelihood.unit_cov_matrix), amp2:
    scalar, dadd: (N,) diagonal additions (noise on real rows, 1 on
    padded), resid: (N,).  On TPU at supported shapes this factors the
    SHIFTED unit matrix M + diag(dadd/amp2) in the fused kernel —
    the exact assembly/rounding every slice-sampling evaluation used
    (fma_logdet_q) — then rescales analytically:
        L = √amp2·L̃,  L⁻¹ = L̃⁻¹/√amp2,  α = (L̃⁻ᵀw̃)/amp2,
    with the blocked triangular inversion (tri_inverse_pallas) for L̃⁻¹.
    Factoring the sampler's own form matters at the f32 conditioning
    edge: hypers the sampler accepted as finite were observed to NaN
    under a separately XLA-assembled factorization of the same K
    (tests/test_tpu_smoke.py, r4).  The XLA path (CPU goldens,
    unsupported shapes) is bit-identical to the r3 cache sequence:
    assemble → cholesky → cho_solve → tri_inverse.  On the fused path
    L's tiles strictly above the block diagonal contain garbage —
    triangular consumers only (L⁻¹ is dense-complete with exact upper
    zeros).  Not differentiable on the fused path (caches are
    constants w.r.t. the EI optimization variables).
    """
    if _fused_ok(m0.shape[-1]):
        chol, linv, alpha = _fused_cache_factor(
            m0[None], amp2[None], dadd[None], resid[None])
        return chol[0], linv[0], alpha[0]
    return _xla_cache_factor(m0, amp2, dadd, resid)


def _xla_cache_factor(m0, amp2, dadd, resid):
    k = amp2 * m0 + dadd * jnp.eye(m0.shape[-1], dtype=m0.dtype)
    chol = cholesky(k)
    alpha = chol_solve(chol, resid)
    linv = tri_inverse(chol)
    return chol, linv, alpha


def _fused_cache_factor(m0, amp2, dadd, resid):
    from spearmint_tpu.ops.pallas_gp import (
        shifted_factor_logdet_q_pallas, tri_inverse_pallas,
    )

    _, _, l_sh, w_sh = shifted_factor_logdet_q_pallas(
        m0, dadd / amp2[:, None], resid)
    linv_sh = tri_inverse_pallas(l_sh)
    s = jnp.sqrt(amp2)
    chol = l_sh * s[:, None, None]
    linv = linv_sh / s[:, None, None]
    # α = K⁻¹r = (1/amp2)·L̃⁻ᵀ(L̃⁻¹r) = L̃⁻ᵀw̃/amp2, batched GEMV
    alpha = jnp.einsum("kij,ki->kj", linv_sh, w_sh,
                       precision=jax.lax.Precision.HIGHEST) / amp2[:, None]
    return chol, linv, alpha


@jax.custom_batching.custom_vmap
def factor_solve(m0: jnp.ndarray, amp2: jnp.ndarray, dadd: jnp.ndarray,
                 resid: jnp.ndarray):
    """(L, K⁻¹ resid) for K = amp2·m0 + diag(dadd) — the no-L⁻¹
    posterior-cache form (the >8k-pad memory policy's
    ``explicit_inverse=False`` route).

    Same dispatch as ``cache_factor`` minus the triangular inversion:
    on TPU the fused shifted kernel emits L̃ and w̃ = L̃⁻¹r in one
    launch and α = L̃⁻ᵀw̃/amp2 is one backward trisolve; off-TPU it is
    bit-identical to the r3 sequence (assemble → cholesky → cho_solve).
    L's tiles strictly above the block diagonal contain garbage on the
    fused path — triangular consumers only.
    """
    if _fused_ok(m0.shape[-1]):
        chol, alpha = _fused_factor_solve(
            m0[None], amp2[None], dadd[None], resid[None])
        return chol[0], alpha[0]
    k = amp2 * m0 + dadd * jnp.eye(m0.shape[-1], dtype=m0.dtype)
    chol = cholesky(k)
    alpha = chol_solve(chol, resid)
    return chol, alpha


def _fused_factor_solve(m0, amp2, dadd, resid):
    from spearmint_tpu.ops.pallas_gp import shifted_factor_logdet_q_pallas

    _, _, l_sh, w_sh = shifted_factor_logdet_q_pallas(
        m0, dadd / amp2[:, None], resid)
    s = jnp.sqrt(amp2)
    chol = l_sh * s[:, None, None]
    # α = (1/amp2)·L̃⁻ᵀ w̃ (backward substitution; reads lower tri only)
    alpha = jax.lax.linalg.triangular_solve(
        l_sh, w_sh[..., None], left_side=True, lower=True,
        transpose_a=True)[..., 0] / amp2[:, None]
    return chol, alpha


@factor_solve.def_vmap
def _factor_solve_vmap(axis_size, in_batched, m0, amp2, dadd, resid):
    args = [m0, amp2, dadd, resid]
    args = [
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    ]
    m0, amp2, dadd, resid = args
    if _fused_ok(m0.shape[-1]):
        chol, alpha = _fused_factor_solve(m0, amp2, dadd, resid)
    else:
        eye = jnp.eye(m0.shape[-1], dtype=m0.dtype)
        k = amp2[:, None, None] * m0 + dadd[:, :, None] * eye
        chol = cholesky(k)
        alpha = jax.vmap(chol_solve)(chol, resid)
    return (chol, alpha), (True, True)


@cache_factor.def_vmap
def _cache_factor_vmap(axis_size, in_batched, m0, amp2, dadd, resid):
    args = [m0, amp2, dadd, resid]
    args = [
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    ]
    m0, amp2, dadd, resid = args
    if _fused_ok(m0.shape[-1]):
        chol, linv, alpha = _fused_cache_factor(m0, amp2, dadd, resid)
    else:
        eye = jnp.eye(m0.shape[-1], dtype=m0.dtype)
        k = amp2[:, None, None] * m0 + dadd[:, :, None] * eye
        chol = cholesky(k)
        alpha = jax.vmap(chol_solve)(chol, resid)
        linv = tri_inverse(chol)
    return (chol, linv, alpha), (True, True, True)


def masked_min(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, x, jnp.inf))


def masked_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, x, -jnp.inf))


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_std(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Population std over masked entries (matches ``np.std``)."""
    m = mask.astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mu = jnp.sum(x * m) / cnt
    var = jnp.sum(((x - mu) ** 2) * m) / cnt
    return jnp.sqrt(var)
