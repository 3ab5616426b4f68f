"""Observation-axis (`obs`) sharded GP primitives for large-n.

SURVEY.md §2b maps the reference's missing tensor-parallel analogue to
"shard the n×n kernel matrix / Cholesky across an `obs` mesh axis for
large-n GP".  Chain parallelism covers every BASELINE config whose
chains ≥ devices; this module is the other regime — fewer chains than
devices, or an n×n working set that must be split — and provides

  * ``cov_colblock``        distributed kernel-matrix assembly,
  * ``cholesky_colblock``   distributed right-looking Cholesky,
  * ``solve_colblock``      distributed forward substitution,
  * ``logprob_colblock``    GP log-marginal from sharded blocks,
  * ``posterior_colblock``  posterior mean/var at replicated candidates,

all written against a 1-D ``obs`` mesh axis inside ``jax.shard_map``.

Layout: **column blocks**.  Device j of ``ndev`` owns the [N, Nl]
column slab of the symmetric matrix (Nl = N/ndev) and the matching
[Nl] slice of vectors.  A lower-Cholesky column panel then lives
entirely on one device, so panel factorization (small Cholesky + one
[N, Nl] triangular solve) is device-local; one collective per panel
step moves the factored panel to everyone for the MXU trailing GEMM:

  for k in 0..ndev-1 (static):                   # right-looking
    every device factors ITS slab as if active   # uniform SPMD, no cond
    panel_k = psum(mask(j == k) · my_panel)      # broadcast the real one
    j > k:  slab -= panel_k @ panel_k[my rows]ᵀ  # trailing update (MXU)
    j == k: slab = panel_k                       # done

The redundant local factoring keeps the program SPMD-uniform; its cost,
O(N·Nl²) per device per sweep, matches the trailing-update cost — the
sequential fraction is ~1/ndev, so the factorization strong-scales.

Forward substitution runs the same masked-psum pipeline per block
(O(ndev) latency on O(N²)/O(N²C) work).  Collectives are psum/all_gather
over `obs` — ICI-ridden under GSPMD on a real slice; validated on the
8-virtual-CPU-device mesh in tests/test_obs_shard.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import _effective_jitter

OBS_AXIS = "obs"


def _my_index():
    return lax.axis_index(OBS_AXIS)


def _bcast_from(value, src_index):
    """SPMD-uniform broadcast: zero everywhere but `src_index`, psum.

    ``where`` (not multiply) so non-source NaNs — e.g. a speculatively
    factored not-yet-updated slab — cannot poison the reduction.
    """
    return lax.psum(
        jnp.where(_my_index() == src_index, value, 0.0), OBS_AXIS)


# --------------------------------------------------------------- assembly
def cov_colblock(x, mask, amp2, noise, ls, kernel: Callable = matern52):
    """My [N, Nl] column slab of amp2·(k(X,X)+εI) + noise·I, masked.

    Padded rows/cols (mask False) are replaced by identity rows exactly
    as core/linalg.mask_psd_matrix does, so the sharded factorization of
    a padded matrix equals the unsharded one.  ``x``/``mask`` are
    replicated [N, D]/[N]; only the column slab is materialized.
    """
    ndev = lax.axis_size(OBS_AXIS)
    n = x.shape[0]
    nl = n // ndev
    col0 = _my_index() * nl
    x_cols = lax.dynamic_slice_in_dim(x, col0, nl, axis=0)
    mask_cols = lax.dynamic_slice_in_dim(mask, col0, nl, axis=0)

    k = kernel(x, x_cols, ls)                       # [N, Nl]
    rows = lax.broadcasted_iota(jnp.int32, (n, nl), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, nl), 1) + col0
    on_diag = rows == cols
    k = amp2 * (k + _effective_jitter(n) * on_diag) + noise * on_diag
    # identity rows/cols for padded points
    both = mask[:, None] & mask_cols[None, :]
    return jnp.where(both, k, on_diag.astype(k.dtype))


# ------------------------------------------------------------- cholesky
def cholesky_colblock(a_col):
    """Distributed lower Cholesky of a PSD matrix in column slabs.

    ``a_col``: my [N, Nl] slab.  Returns my slab of L (strictly upper
    entries zeroed).
    """
    n, nl = a_col.shape
    ndev = n // nl
    j = _my_index()
    row0 = j * nl
    rows = lax.broadcasted_iota(jnp.int32, (n, nl), 0)

    def factor_local(slab):
        """Factor my slab as the active panel: chol of my diagonal
        block + triangular solve of the rows below it."""
        diag = lax.dynamic_slice(slab, (row0, 0), (nl, nl))
        l_dd = jnp.linalg.cholesky(diag)
        # rows below the diagonal block: A_below · L_dd⁻ᵀ, computed for
        # the whole slab then masked by row position
        solved = lax.linalg.triangular_solve(
            l_dd, slab, left_side=False, lower=True, transpose_a=True)
        l_panel = jnp.where(
            rows < row0, 0.0,
            jnp.where(rows < row0 + nl,
                      _embed(l_dd, n, row0), solved))
        return l_panel

    slab = a_col
    for k in range(ndev):
        panel = factor_local(slab)
        panel_k = _bcast_from(panel, k)             # [N, Nl] of column k
        # my diagonal-block rows of panel k (for the trailing GEMM)
        pk_mine = lax.dynamic_slice(panel_k, (row0, 0), (nl, nl))
        trailing = slab - jnp.matmul(panel_k, pk_mine.T,
                                    precision=lax.Precision.HIGHEST)
        jk = jnp.int32(j)
        slab = jnp.where(jk == k, panel_k,
                         jnp.where(jk > k, trailing, slab))
    return slab


def _embed(block, n, row0):
    """Place an [Nl, Nl] block at rows [row0, row0+Nl) of an [N, Nl]."""
    out = jnp.zeros((n, block.shape[1]), block.dtype)
    return lax.dynamic_update_slice(out, block, (row0, 0))


# ---------------------------------------------------------------- solves
def solve_colblock(l_col, b):
    """Forward substitution L z = b with L in column slabs.

    ``b``: replicated [N] or [N, C].  Returns replicated z of the same
    shape.  Block pipeline: at step k the owner of block k solves its
    diagonal system and broadcasts both its solution slice and its
    column's contribution to later rows.
    """
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    n, nl = l_col.shape
    ndev = n // nl
    row0 = _my_index() * nl
    l_dd = lax.dynamic_slice(l_col, (row0, 0), (nl, nl))  # my diag block

    z = jnp.zeros_like(b)
    resid = b
    for k in range(ndev):
        r_mine = lax.dynamic_slice_in_dim(resid, row0, nl, axis=0)
        z_mine = lax.linalg.triangular_solve(
            l_dd, r_mine, left_side=True, lower=True)
        # contribution of my column block to all later rows
        upd_mine = jnp.matmul(l_col, z_mine,
                              precision=lax.Precision.HIGHEST)  # [N, C]
        z_k = _bcast_from(_embed(z_mine, n, row0), k)
        upd_k = _bcast_from(upd_mine, k)
        z = z + z_k
        resid = resid - upd_k
    return z[:, 0] if vec else z


# --------------------------------------------------------- log marginal
def logprob_colblock(x, y, mask, mean, amp2, noise, ls,
                     kernel: Callable = matern52):
    """GP log-marginal (reference logprob semantics, likelihood.py
    parity) computed from obs-sharded blocks.  x/y/mask replicated."""
    n = x.shape[0]
    nl = n // lax.axis_size(OBS_AXIS)
    row0 = _my_index() * nl
    a_col = cov_colblock(x, mask, amp2, noise, ls, kernel)
    l_col = cholesky_colblock(a_col)
    # log det: my diagonal entries live at rows row0+c, column c
    diag_mine = lax.dynamic_slice(l_col, (row0, 0), (nl, nl))
    logdet_half = lax.psum(
        jnp.sum(jnp.log(jnp.diagonal(diag_mine))), OBS_AXIS)
    resid = jnp.where(mask, y - mean, 0.0)
    zed = solve_colblock(l_col, resid)
    return -logdet_half - 0.5 * jnp.sum(zed * zed)


# ------------------------------------------------------------- posterior
def posterior_colblock(x, y, mask, cand, mean, amp2, noise, ls,
                       kernel: Callable = matern52):
    """Posterior mean/var at replicated candidates from sharded blocks.

    Mirrors acquire/ei.posterior_from_cache: m = mean + k*ᵀK⁻¹(y−mean),
    v = amp2(1+ε) − Σ(L⁻¹k*)².
    """
    a_col = cov_colblock(x, mask, amp2, noise, ls, kernel)
    l_col = cholesky_colblock(a_col)
    kx = amp2 * kernel(x, cand, ls) * mask[:, None]       # [N, C]
    resid = jnp.where(mask, y - mean, 0.0)
    alpha = solve_colblock(l_col, resid)
    alpha = _backsolve(l_col, alpha)
    mu = mean + jnp.matmul(kx.T, alpha, precision=lax.Precision.HIGHEST)
    beta = solve_colblock(l_col, kx)
    # prior-variance jitter must match cov_colblock's assembled
    # diagonal (_effective_jitter, not the bare 1e-6 — see
    # acquire/ei.posterior_from_cache)
    var = (amp2 * (1.0 + _effective_jitter(x.shape[0]))
           - jnp.sum(beta * beta, axis=0))
    return mu, var


def _backsolve(l_col, z):
    """Backward substitution Lᵀ w = z (z, w replicated [N]).

    Runs the block pipeline in reverse: Lᵀ's row block k is L's column
    slab k transposed, so each step is fully local to one device.
    """
    n, nl = l_col.shape
    ndev = n // nl
    row0 = _my_index() * nl
    l_dd = lax.dynamic_slice(l_col, (row0, 0), (nl, nl))

    w = jnp.zeros_like(z)
    for k in reversed(range(ndev)):
        # my rows of Lᵀ = my column slab transposed: [Nl, N]
        r_mine = lax.dynamic_slice_in_dim(z, row0, nl, axis=0)
        r_mine = r_mine - jnp.matmul(l_col.T, w,
                                     precision=lax.Precision.HIGHEST)
        w_mine = lax.linalg.triangular_solve(
            l_dd, r_mine[:, None], left_side=True, lower=True,
            transpose_a=True)[:, 0]
        w = w + _bcast_from(_embed(w_mine[:, None], n, row0), k)[:, 0]
    return w


# ------------------------------------------------------------ public API
def use_obs_gate(obs_shard_min: int, ndev: int, pad: int,
                 n_pending: int) -> bool:
    """The production obs-mesh routing decision, shared by the GP
    choosers (GPEIOptChooser and GPEIperSecChooser): shard the n×n
    working set over the `obs` mesh once the pad reaches
    ``obs_shard_min`` on a multi-device runtime whose device count
    divides the pad.  Pending jobs fall back to the chains-mesh path
    (fantasization lives there)."""
    return (obs_shard_min > 0 and ndev > 1 and pad >= obs_shard_min
            and pad % ndev == 0 and n_pending == 0)


def make_obs_mesh(n_devices: int | None = None,
                  devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (OBS_AXIS,))


def sharded_logprob(mesh: Mesh, kernel: Callable = matern52):
    """jit-compiled obs-sharded log-marginal over replicated inputs."""
    fn = functools.partial(logprob_colblock, kernel=kernel)
    rep = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rep,) * 7, out_specs=rep,
        check_vma=False,
    )
    return jax.jit(mapped)


def _marginal_colblock(x, y, mask, hypers, kernel=matern52):
    """core.likelihood.log_marginal drop-in, obs-sharded (with the same
    NaN→−inf guard so slice sampling treats failed factorizations as
    zero-probability rather than poisoning the chain)."""
    lp = logprob_colblock(x, y, mask, hypers.mean, hypers.amp2,
                          hypers.noise, hypers.ls, kernel)
    return jnp.where(jnp.isnan(lp), -jnp.inf, lp)


def sharded_sample_hypers(mesh: Mesh, config=None):
    """One full slice-sampling hyperparameter sweep with every GP
    log-marginal evaluation computed obs-sharded.

    This is the chains < devices regime: a single chain's O(n³)
    likelihood work spreads over the mesh instead of idling all but one
    device.  Inputs/outputs are replicated; the n×n working set only
    ever exists as column slabs.
    """
    from spearmint_tpu.mcmc.chains import MCMCConfig, sample_hypers

    config = config or MCMCConfig()
    cfg = config._replace(marginal=_marginal_colblock)

    def fn(key, mean, amp2, noise, ls, x, y, mask):
        from spearmint_tpu.core.likelihood import GPHypers

        h = sample_hypers(key, GPHypers(mean, amp2, noise, ls), x, y,
                          mask, cfg)
        return h.mean, h.amp2, h.noise, h.ls

    rep = P()
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(rep,) * 8,
        out_specs=(rep,) * 4, check_vma=False,
    )

    def wrapped(key, hypers, x, y, mask):
        from spearmint_tpu.core.likelihood import GPHypers

        out = jax.jit(mapped)(key, hypers.mean, hypers.amp2, hypers.noise,
                              hypers.ls, x, y, mask)
        return GPHypers(*out)

    return wrapped


def sharded_posterior(mesh: Mesh, kernel: Callable = matern52):
    """jit-compiled obs-sharded posterior mean/var at candidates."""
    fn = functools.partial(posterior_colblock, kernel=kernel)
    rep = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rep,) * 8, out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(mapped)


# ---------------------------------------- shared suggestion-step pieces
def _chunk_candidates(cand, chunk):
    """Pad the candidate set to whole chunks (first candidate repeated;
    extra rows discarded by the caller's [:c] trim).  Returns
    ([n_chunks, chunk, D], padded)."""
    c = cand.shape[0]
    chunk = min(chunk, c)
    n_chunks = -(-c // chunk)
    padded = n_chunks * chunk
    cand_p = cand
    if padded != c:
        cand_p = jnp.concatenate(
            [cand, jnp.broadcast_to(cand[:1],
                                    (padded - c, cand.shape[1]))], 0)
    return cand_p.reshape(n_chunks, chunk, cand.shape[1]), padded


def _value_pieces(x, data, mask, h, kernel):
    """One sample's obs-sharded factorization bundle:
    (l_col, alpha = K⁻¹(data − mean), ok = factorization finite)."""
    a_col = cov_colblock(x, mask, h.amp2, h.noise, h.ls, kernel)
    l_col = cholesky_colblock(a_col)
    resid = jnp.where(mask, data - h.mean, 0.0)
    alpha = _backsolve(l_col, solve_colblock(l_col, resid))
    return l_col, alpha, jnp.all(jnp.isfinite(alpha))


def _ei_chunk(x, mask, h, l_col, alpha, best, cc, kernel):
    """EI at one candidate chunk from an obs-sharded bundle — the ONE
    obs-path EI formula (acquire/ei semantics; prior-variance jitter
    matches the assembled covariance diagonal)."""
    kx = h.amp2 * kernel(x, cc, h.ls) * mask[:, None]
    mu = h.mean + jnp.matmul(kx.T, alpha,
                             precision=lax.Precision.HIGHEST)
    beta = solve_colblock(l_col, kx)
    var = (h.amp2 * (1.0 + _effective_jitter(x.shape[0]))
           - jnp.sum(beta * beta, 0))
    sigma = jnp.sqrt(jnp.maximum(var, 1e-14))
    u = (best - mu) / sigma
    return sigma * (u * jax.scipy.stats.norm.cdf(u)
                    + jax.scipy.stats.norm.pdf(u))


def _sweep_family(k, h0s, x, data, mask, mcfg, iters, chain_chunk):
    """vmapped chains × scanned iters of obs-sharded slice sweeps
    (the MCMC driver shared by both sharded suggestion steps)."""
    from spearmint_tpu.engine.suggest import _chunked_vmap, _flatten_samples
    from spearmint_tpu.mcmc.chains import marginal_at, sample_hypers_lp

    chains = h0s.mean.shape[0]

    def chain_fn(kk, h0):
        ks = jax.random.split(kk, iters)
        lp0 = marginal_at(x, data, mask, h0, mcfg)

        def bd(carry, k2):
            h, lp = carry
            h2, lp2 = sample_hypers_lp(k2, h, lp, x, data, mask, mcfg)
            return (h2, lp2), h2

        (h_out, _), samples = lax.scan(bd, (h0, lp0), ks)
        return h_out, samples

    h_last, samples = _chunked_vmap(chain_fn, chain_chunk)(
        jax.random.split(k, chains), h0s)
    return h_last, _flatten_samples(samples, chains * iters)


# ------------------------------------------------- full suggestion step
def sharded_suggest_obs(mesh: Mesh, config):
    """The PRODUCTION large-n suggestion: a full fully-Bayesian GP-EI
    step whose n×n working set only ever exists as obs-sharded column
    slabs (BASELINE config 5: 10k obs, chains, large EI candidate sets).

    Same semantics as ``engine.suggest.suggest_step`` with two
    intentional differences for this regime:

      * no pending fantasization (the chooser falls back to the
        chains-mesh path when jobs are pending — at 10k+ observations
        the posterior is dominated by data, and the augmented (n+p)²
        factorization would shard identically anyway);
      * no L-BFGS off-grid refinement — the large-C candidate sweep IS
        the optimizer here (grid density at 10⁵–10⁶ candidates puts the
        argmax within quantization distance of the EI optimum, and the
        reference's 20-start refinement exists to compensate for its
        20k-point grids).  ``x_opt``/``ei_opt`` return the grid argmax.

    Layout inside one ``shard_map`` over the 1-D ``obs`` mesh:
    chain states replicated and vmapped (each slice-sampling likelihood
    eval distributes its Cholesky over the mesh via the colblock
    primitives); the EI phase runs samples sequentially (``lax.map``),
    each building one sharded factorization and sweeping the candidate
    set in chunks through pipelined distributed triangular solves.

    Returns a callable (key, hypers[chains], x, y, mask, cand,
    cand_mask) → engine.suggest.SuggestResult.
    """
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.engine.suggest import SuggestResult, nan_robust_mean

    kernel = config.kernel
    # band_joint off: the banded joint move would assemble the full n×n
    # M per device — the obs path exists precisely to never do that.
    mcfg = config.mcmc._replace(
        marginal=functools.partial(_marginal_colblock), band_joint=False)
    iters = config.mcmc_iters
    cand_chunk = 4096

    def body(key, mean, amp2, noise, ls, x, y, mask, cand, cand_mask):
        hypers = GPHypers(mean, amp2, noise, ls)
        # Same key discipline as suggest_step (split off the unused
        # fantasy key) so both paths draw identical chain randomness.
        k_chains, _ = jax.random.split(key)
        h_last, flat = _sweep_family(k_chains, hypers, x, y, mask, mcfg,
                                     iters, config.chain_chunk)

        c = cand.shape[0]
        chunks, padded = _chunk_candidates(cand, cand_chunk)

        def per_sample_ei(h):
            # sample usable only if its distributed factorization was
            # finite (mirrors engine/suggest.py's cache ok-mask; the
            # 10k+-obs pod path is the MOST f32-conditioning-exposed
            # route in the codebase — r4 proved this failure mode on
            # hardware, tests/test_tpu_smoke.py)
            l_col, alpha, ok = _value_pieces(x, y, mask, h, kernel)
            best = jnp.min(jnp.where(mask, y, jnp.inf))
            ei = lax.map(
                lambda cc: _ei_chunk(x, mask, h, l_col, alpha, best, cc,
                                     kernel), chunks)
            return ei.reshape(padded)[:c], ok

        ei_samples, ok = lax.map(per_sample_ei, flat)    # [S, C], [S]
        # NaN-robust sample average (engine/suggest.py parity): one
        # conditioning-edge sample must not poison every candidate.
        ei_mean, n_ok_true = nan_robust_mean(ei_samples, ok)
        ei_masked = jnp.where(cand_mask, ei_mean, -jnp.inf)
        best_cand = jnp.argmax(ei_masked)
        best_ei = ei_masked[best_cand]
        return (h_last.mean, h_last.amp2, h_last.noise, h_last.ls,
                flat.mean, flat.amp2, flat.noise, flat.ls,
                ei_mean, best_cand, best_ei, cand[best_cand], n_ok_true)

    rep = P()
    mapped = jax.shard_map(
        body, mesh=mesh, in_specs=(rep,) * 10, out_specs=(rep,) * 13,
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def wrapped(key, hypers: GPHypers, x, y, mask, cand, cand_mask):
        out = jitted(key, hypers.mean, hypers.amp2, hypers.noise,
                     hypers.ls, x, y, mask, cand, cand_mask)
        return SuggestResult(
            hypers=GPHypers(*out[0:4]), samples=GPHypers(*out[4:8]),
            ei=out[8], best_cand=out[9], best_cand_ei=out[10],
            x_opt=out[11], ei_opt=out[10], n_ok=out[12],
        )

    return wrapped


def sharded_suggest_per_sec(mesh: Mesh, config):
    """Obs-sharded EI-per-second suggestion (dual GP, large n).

    VERDICT r4 next #5: before this, the per-sec chooser ran its TWO
    n×n working sets (value GP + log-duration GP) replicated on every
    device of a real mesh.  Same regime and same intentional deltas as
    ``sharded_suggest_obs`` (no pending — the chooser falls back to the
    chains path; no L-BFGS — the dense candidate sweep is the
    optimizer); both chain families sweep with obs-sharded marginals
    and each EI/sec sample builds two sharded factorizations.

    Returns a callable (key, hypers, time_hypers, x, y, log_durs,
    mask, cand, cand_mask) → engine.per_sec.PerSecResult.
    """
    from spearmint_tpu.core.likelihood import GPHypers
    from spearmint_tpu.engine.per_sec import PerSecResult
    from spearmint_tpu.engine.suggest import nan_robust_mean

    kernel = config.kernel
    mcfg = config.mcmc._replace(
        marginal=functools.partial(_marginal_colblock), band_joint=False)
    iters = config.mcmc_iters
    cand_chunk = 4096

    def body(key, h_parts, t_parts, x, y, log_durs, mask, cand, cand_mask):
        hypers = GPHypers(*h_parts)
        t_hypers = GPHypers(*t_parts)
        k_val, k_time, _ = jax.random.split(key, 3)

        h_last, flat = _sweep_family(k_val, hypers, x, y, mask, mcfg,
                                     iters, config.chain_chunk)
        t_last, t_flat = _sweep_family(k_time, t_hypers, x, log_durs,
                                       mask, mcfg, iters,
                                       config.chain_chunk)

        c = cand.shape[0]
        chunks, padded = _chunk_candidates(cand, cand_chunk)

        def per_sample(pair):
            h, th = pair
            l_col, alpha, ok_v = _value_pieces(x, y, mask, h, kernel)
            best = jnp.min(jnp.where(mask, y, jnp.inf))
            tl_col, t_alpha, ok_t = _value_pieces(x, log_durs, mask, th,
                                                  kernel)
            del tl_col  # only the duration posterior MEAN is needed
            ok = ok_v & ok_t

            def eips_chunk(cc):
                ei = _ei_chunk(x, mask, h, l_col, alpha, best, cc,
                               kernel)
                tkx = th.amp2 * kernel(x, cc, th.ls) * mask[:, None]
                t_mu = th.mean + jnp.matmul(
                    tkx.T, t_alpha, precision=lax.Precision.HIGHEST)
                return ei / jnp.maximum(jnp.exp(t_mu), 1e-3)

            return lax.map(eips_chunk, chunks).reshape(padded)[:c], ok

        ei_samples, ok = lax.map(per_sample, (flat, t_flat))   # [S, C]
        ei_mean, n_ok_true = nan_robust_mean(ei_samples, ok)
        ei_masked = jnp.where(cand_mask, ei_mean, -jnp.inf)
        best_cand = jnp.argmax(ei_masked)
        best_ei = ei_masked[best_cand]
        return (h_last.mean, h_last.amp2, h_last.noise, h_last.ls,
                t_last.mean, t_last.amp2, t_last.noise, t_last.ls,
                ei_mean, best_cand, best_ei, cand[best_cand], n_ok_true)

    rep = P()
    mapped = jax.shard_map(
        body, mesh=mesh, in_specs=(rep,) * 9, out_specs=(rep,) * 13,
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def wrapped(key, hypers, time_hypers, x, y, log_durs, mask, cand,
                cand_mask):
        from spearmint_tpu.core.likelihood import GPHypers

        out = jitted(key, tuple(hypers), tuple(time_hypers), x, y,
                     log_durs, mask, cand, cand_mask)
        return PerSecResult(
            hypers=GPHypers(*out[0:4]), time_hypers=GPHypers(*out[4:8]),
            ei_per_s=out[8], best_cand=out[9], best_cand_ei=out[10],
            x_opt=out[11], ei_opt=out[10], n_ok=out[12],
        )

    return wrapped
