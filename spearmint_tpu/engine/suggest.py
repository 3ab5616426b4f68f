"""The end-to-end jitted suggestion step (the rebuild's hot path).

This one pure function replaces the whole numerical body of
``GPEIOptChooser.next`` (reference ≈L150-280, SURVEY.md §3.2):

  reference (single persistent chain, sequential, CPU):
      for i in range(mcmc_iters): sample_hypers(); ei += compute_ei(...)
      top-k grid EI → scipy L-BFGS-B per start (mp.Pool)

  rebuild (chains × iters batched, one XLA program):
      vmap over `chains` of lax.scan(mcmc_iters) slice-sampling sweeps
      → per-sample posterior caches (Cholesky batched over samples)
      → fantasized pending outcomes as an extra batched draw
      → EI[S, C] (S = chains·iters samples, C candidates), masked mean
      → top-k starts → batched projected L-BFGS on the sample-averaged EI

  Sharding: vmapped chain states shard over a `chains` mesh axis and the
  candidate batch over `cand` (SURVEY.md §2b); apply in_shardings at the
  jit call site (see engine/mesh.py) and GSPMD inserts the collectives
  (the candidate argmax becomes an all-reduce over `cand`).

Shapes are static: observations padded to a bucket with a mask (see
core/linalg.py), pending padded likewise, candidates padded with a mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from spearmint_tpu.acquire import ei as ei_mod
from spearmint_tpu.acquire.fantasy import fantasize_batch
from spearmint_tpu.acquire.optimize import minimize_lbfgs_b
from spearmint_tpu.core.kernels import get_kernel
from spearmint_tpu.core.likelihood import GPHypers
from spearmint_tpu.mcmc.chains import (
    MCMCConfig, marginal_at, sample_hypers_lp,
)


class SuggestConfig(NamedTuple):
    """Static configuration (hashable → jit static argument).

    Defaults mirror the reference chooser args (mcmc_iters=10,
    grid_subset=20 L-BFGS starts, burn-in 100 on first call).
    """

    mcmc_iters: int = 10
    noiseless: bool = False
    kernel_name: str = "Matern52"
    max_ls: float = 2.0
    grid_subset: int = 20
    lbfgs_iters: int = 50
    optimize: bool = True          # False → grid-only EI (GPEIChooser mode)
    has_pending: bool = False      # static: pending branch traced only if used
    n_fantasies: int = 10          # fantasy draws per hyper sample
                                   # (reference pending_samples default 100;
                                   # EI averages over chains×iters×fantasies)
    chain_chunk: int = 0           # >0: lax.map the chain/sample axis in
                                   # groups of this size — bounds HBM at
                                   # large n (chains·n² cov buffers);
                                   # chains must divide evenly
    explicit_inverse: bool = True  # materialize L⁻¹ per sample so every
                                   # EI eval (grid sweep + L-BFGS point
                                   # evals) is a GEMM, not a sequential
                                   # trisolve; costs one extra [S, N, N]
                                   # buffer + one triangular inversion
    band_joint: bool = False       # joint slice move via per-move band
                                   # reduction (ops/band): O(n·b²) per
                                   # evaluation instead of the fused
                                   # O(n³); pays one GEMM reduction per
                                   # move — wins at large pads (the
                                   # chooser gates on band_joint_min)
    @property
    def kernel(self):
        return get_kernel(self.kernel_name)

    @property
    def mcmc(self) -> MCMCConfig:
        return MCMCConfig(
            noiseless=self.noiseless, max_ls=self.max_ls,
            kernel=self.kernel, band_joint=self.band_joint,
        )


class SuggestResult(NamedTuple):
    hypers: GPHypers       # [chains, ...] updated chain states
    samples: GPHypers      # [S, ...] this call's hyperparameter samples
    ei: jnp.ndarray        # [C] sample-averaged EI over the candidate set
    best_cand: jnp.ndarray     # argmax index into the candidate set
    best_cand_ei: jnp.ndarray  # its EI
    x_opt: jnp.ndarray         # (D,) best off-grid optimized point
    ei_opt: jnp.ndarray        # its EI (== -min L-BFGS objective)
    n_ok: jnp.ndarray = None   # int: samples whose cache factorization
                               # was finite and entered the EI average.
                               # 0 → every sample failed (the averaged
                               # EI is all zeros and the argmax carries
                               # no signal) — callers must not dispatch
                               # the returned point (the chooser falls
                               # back to grid order and logs the event)


def _flatten_samples(samples: GPHypers, s: int) -> GPHypers:
    """[chains, iters, ...] → [S, ...], chains-major (shardable by chain)."""
    return jax.tree.map(lambda a: a.reshape((s,) + a.shape[2:]), samples)


def nan_robust_mean(samples: jnp.ndarray, ok: jnp.ndarray):
    """Sample average excluding failed/non-finite samples.

    samples: [S, ...] per-sample values; ok: [S] bool (sample usable —
    its cache factorization was finite).  Returns (mean over axis 0,
    n_ok int32).  n_ok == 0 → the mean is all zeros and carries no
    signal; every engine returns n_ok so the choosers can fall back to
    grid order instead of dispatching the meaningless argmax.  ONE
    definition shared by all engines — the degenerate-suggestion
    contract must not drift between them.
    """
    n_ok_true = jnp.sum(ok.astype(jnp.int32))
    n_ok = jnp.maximum(n_ok_true.astype(samples.dtype), 1.0)
    ok_b = ok.reshape(ok.shape + (1,) * (samples.ndim - 1))
    samples = jnp.where(ok_b & jnp.isfinite(samples), samples, 0.0)
    return jnp.sum(samples, axis=0) / n_ok, n_ok_true


def _chunked_vmap(fn, chunk: int):
    """vmap with the leading axis processed in sequential groups.

    chunk <= 0 → plain vmap.  Otherwise the leading axis (must divide by
    chunk) maps in groups via lax.map, capping live O(axis·n²) buffers at
    O(chunk·n²) — the single-chip path for the large-n config (pods get
    the same effect by sharding chains over the mesh instead).
    """
    def run(*args):
        if chunk <= 0:
            return jax.vmap(fn)(*args)
        lead = jax.tree.leaves(args[0])[0].shape[0]
        if lead % chunk != 0:
            return jax.vmap(fn)(*args)
        g = lead // chunk

        def regroup(a):
            return a.reshape((g, chunk) + a.shape[1:])

        grouped = jax.tree.map(regroup, args)
        out = lax.map(lambda gr: jax.vmap(fn)(*gr), grouped)
        return jax.tree.map(
            lambda a: a.reshape((lead,) + a.shape[2:]), out)

    return run


@partial(jax.jit, static_argnames=("config",))
def suggest_step(
    key: jax.Array,
    hypers: GPHypers,          # [chains, ...] chain states
    x: jnp.ndarray,            # [N, D] padded observations
    y: jnp.ndarray,            # [N]
    mask: jnp.ndarray,         # [N] bool
    pend: jnp.ndarray,         # [P, D] padded pending points
    pend_mask: jnp.ndarray,    # [P] bool
    cand: jnp.ndarray,         # [C, D] padded candidates
    cand_mask: jnp.ndarray,    # [C] bool
    config: SuggestConfig = SuggestConfig(),
) -> SuggestResult:
    chains = hypers.mean.shape[0]
    iters = config.mcmc_iters
    s = chains * iters
    kernel = config.kernel
    k_chains, k_fant = jax.random.split(key)

    # ---- MCMC: vmap chains × scan iters --------------------------------
    # The GP log-marginal is carried across moves and sweeps (one seed
    # evaluation per chain), so each sweep pays ~2 fewer O(n³)
    # evaluations than the reference's restart-per-move structure.
    def chain_fn(k, h0):
        ks = jax.random.split(k, iters)
        lp0 = marginal_at(x, y, mask, h0, config.mcmc)

        def body(carry, kk):
            h, lp = carry
            h2, lp2 = sample_hypers_lp(kk, h, lp, x, y, mask, config.mcmc)
            return (h2, lp2), h2

        (h_out, _), samples = lax.scan(body, (h0, lp0), ks)
        return h_out, samples

    h_last, samples = _chunked_vmap(chain_fn, config.chain_chunk)(
        jax.random.split(k_chains, chains), hypers)
    flat = _flatten_samples(samples, s)

    # ---- posterior caches (one Cholesky per sample, batched) -----------
    if config.has_pending:
        x_aug = jnp.concatenate([x, pend], axis=0)
        mask_aug = jnp.concatenate([mask, pend_mask], axis=0)
        n_fant = config.n_fantasies

        def per_sample_cache(kk, h):
            # F fantasy draws share one augmented fused-kernel
            # factorization (ei.make_cache_aug — the single home of
            # the pending-path cache numerics).
            fants = fantasize_batch(kk, x, y, mask, pend, pend_mask, h,
                                    n_fant, kernel)               # [F, P]
            y_augs = jnp.concatenate(
                [jnp.broadcast_to(y, (n_fant,) + y.shape), fants], axis=1)
            return ei_mod.make_cache_aug(
                x_aug, mask_aug, y_augs, h, kernel,
                with_inverse=config.explicit_inverse)

        caches = _chunked_vmap(per_sample_cache, config.chain_chunk)(
            jax.random.split(k_fant, s), flat)
        x_all, mask_all = x_aug, mask_aug
    else:
        caches = _chunked_vmap(
            lambda h: ei_mod.make_cache(x, y, mask, h, kernel,
                                        with_inverse=config.explicit_inverse),
            config.chain_chunk,
        )(flat)
        x_all, mask_all = x, mask

    # ---- EI over the candidate grid (chunked to bound HBM temps) -------
    ei_samples = _chunked_vmap(
        lambda c: ei_mod.ei_from_cache_chunked(c, x_all, mask_all, cand,
                                               kernel),
        config.chain_chunk,
    )(caches)  # [S, C] or [S, F, C] with pending fantasies
    if ei_samples.ndim == 3:
        ei_samples = jnp.mean(ei_samples, axis=1)
    # NaN-robust sample average: a hyperparameter state right at the f32
    # conditioning edge can fail its cache factorization (NaN alpha)
    # even though the sampler accepted it — exclude such samples from
    # the EI average instead of letting one NaN poison every candidate
    # (the f64 reference never hits this; it would crash if it did).
    ok = jnp.all(jnp.isfinite(caches.alpha.reshape(s, -1)), axis=1)
    ei_mean, n_ok_true = nan_robust_mean(ei_samples, ok)
    n_ok = jnp.maximum(n_ok_true.astype(ei_mean.dtype), 1.0)
    ei_masked = jnp.where(cand_mask, ei_mean, -jnp.inf)
    best_cand = jnp.argmax(ei_masked)
    best_cand_ei = ei_masked[best_cand]

    # ---- off-grid refinement: batched L-BFGS on sample-averaged EI -----
    if config.optimize:
        ksub = min(config.grid_subset, cand.shape[0])
        _, top_idx = lax.top_k(ei_masked, ksub)
        starts = cand[top_idx]

        def neg_avg_ei(pt):
            eis = jax.vmap(
                lambda c: ei_mod.ei_from_cache(
                    c, x_all, mask_all, pt[None], kernel
                )[..., 0]
            )(caches)  # [S] or [S, F]
            if eis.ndim == 2:
                eis = jnp.mean(eis, axis=1)
            eis = jnp.where(ok & jnp.isfinite(eis), eis, 0.0)
            return -jnp.sum(eis) / n_ok

        dim = cand.shape[1]
        res = minimize_lbfgs_b(
            neg_avg_ei, starts,
            jnp.zeros(dim, cand.dtype), jnp.ones(dim, cand.dtype),
            iters=config.lbfgs_iters,
        )
        best_lane = jnp.argmin(res.fun)
        x_opt = res.x[best_lane]
        ei_opt = -res.fun[best_lane]
    else:
        x_opt = cand[best_cand]
        ei_opt = best_cand_ei

    return SuggestResult(
        hypers=h_last, samples=flat, ei=ei_mean,
        best_cand=best_cand, best_cand_ei=best_cand_ei,
        x_opt=x_opt, ei_opt=ei_opt, n_ok=n_ok_true,
    )


def init_chain_states(
    y: jnp.ndarray, mask: jnp.ndarray, ndim: int, chains: int
) -> GPHypers:
    """Stack of identical reference-init states, one per chain."""
    from spearmint_tpu.mcmc.chains import init_hypers

    h = init_hypers(y, mask, ndim)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (chains,) + a.shape), h)
