"""GP hyperparameter MCMC: one chain step + batched-chain utilities.

Parity: ``GPEIOptChooser.sample_hypers`` / ``_sample_ls`` /
``_sample_noisy`` / ``_sample_noiseless`` (reference ≈L200-260 per
SURVEY.md §3.2).  Reference order of operations, kept exactly:

  1. jointly slice-sample (mean, amp2[, noise]) along a random direction,
     with flat-in-bounds mean, lognormal amp2, horseshoe noise priors;
  2. component-wise slice-sample the ARD length scales under a tophat
     (0, max_ls] prior.

The reference runs ONE persistent chain and loops ``mcmc_iters`` times per
suggestion; here a chain step is a pure function so ``vmap`` gives N
independent chains (the TPU-native "chain parallelism" axis of
SURVEY.md §2b) and ``lax.scan`` gives per-call iterations.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from spearmint_tpu.core import linalg, priors
from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import GPHypers, log_marginal
from spearmint_tpu.mcmc.slice import slice_sample


class MCMCConfig(NamedTuple):
    """Static sampler configuration (hashable → usable as jit static arg)."""

    noiseless: bool = False
    max_ls: float = priors.MAX_LS
    noise_scale: float = priors.NOISE_SCALE
    amp2_scale: float = priors.AMP2_SCALE
    kernel: Callable = matern52
    # GP log-marginal implementation; engine/obs_shard swaps in its
    # observation-sharded version (same (x, y, mask, hypers, kernel)
    # signature) so the whole slice-sampling sweep runs distributed.
    marginal: Callable = log_marginal
    # Joint-move band mode (ops/band): reduce the fixed unit covariance
    # M to block-tridiagonal ONCE per joint move (pure GEMMs), then
    # every slice evaluation of K = amp2·M + diag(dadd) is an O(n·b²)
    # banded factorization instead of the fused O(n³) one.  The two
    # moves stay internally consistent: each evaluates its own lp0
    # through its own path (the banded joint lp0 is one cheap banded
    # eval; the ls move re-seeds with one fused eval), so the carried
    # lp_mar is unused.  Requires a CONTIGUOUS mask (real observations
    # first — how every engine pads; see ops/band module docstring) and
    # n % band_block == 0 (every pad bucket ≥ 512 is).
    band_joint: bool = False
    band_block: int = 128
    # (Two generations of joint-move covariance caches were built and
    # DELETED on measurement.  r2's spectral cache — one eigh per move,
    # O(n) per slice evaluation — died in r3: batched eigh at
    # [10, 5120, 5120] takes 21.35 s on v5e vs 0.063 s for the Cholesky
    # it would amortize (docs/PROFILE_r3.md).  r2's m0 cache — assemble
    # M = k(X,X)+jitter·I once per move, fma per evaluation — died in
    # r4: once log_marginal itself evaluated through the in-kernel
    # shifted form, the cache's only remaining effect was forcing a
    # ~1 GB XLA copy per evaluation (the fused kernel destroys its
    # input, and the cached M outlives the move), measured 0.59 s vs
    # 0.51 s for the fresh-assembly joint move (docs/PROFILE_r4.md).)


def init_hypers(y: jnp.ndarray, mask: jnp.ndarray, ndim: int) -> GPHypers:
    """Reference ``_real_init`` state: ls=1, mean=mean(y), amp2=std(y)+1e-4,
    noise=1e-3 (GPEIOptChooser ≈L90 [verify exact amp2 init])."""
    dtype = y.dtype
    return GPHypers(
        mean=linalg.masked_mean(y, mask),
        amp2=linalg.masked_std(y, mask) + jnp.asarray(1e-4, dtype),
        noise=jnp.asarray(priors.DEFAULT_NOISE, dtype),
        ls=jnp.ones((ndim,), dtype),
    )


def _joint_logprob(vec, x, y, mask, ls, config: MCMCConfig,
                   marginal3: Callable | None = None):
    """Log posterior of (mean, amp2[, noise]) at fixed length scales.

    ``marginal3`` (mean, amp2, noise) → lp overrides the default
    ``config.marginal`` evaluation — the band-mode joint move passes the
    per-move banded closure (ops/band.band_marginal_factory) here.
    """
    mean = vec[0]
    amp2 = vec[1]
    noise = vec[2] if not config.noiseless else jnp.asarray(
        priors.DEFAULT_NOISE, vec.dtype
    )
    y_min = linalg.masked_min(y, mask)
    y_max = linalg.masked_max(y, mask)
    valid = (
        priors.mean_in_bounds(mean, y_min, y_max) & (amp2 > 0.0) & (noise > 0.0)
    )
    amp2_s = jnp.where(amp2 > 0.0, amp2, 1.0)
    noise_s = jnp.where(noise > 0.0, noise, 1.0)
    if marginal3 is None:
        lp = config.marginal(
            x, y, mask, GPHypers(mean, amp2_s, noise_s, ls), config.kernel
        )
    else:
        lp = marginal3(mean, amp2_s, noise_s)
    lp = lp + priors.lognormal_amp2_term(amp2_s, config.amp2_scale)
    if not config.noiseless:
        lp = lp + priors.horseshoe_logpdf(noise_s, config.noise_scale)
    return jnp.where(valid, lp, -jnp.inf)


def _ls_logprob(ls, x, y, mask, hypers: GPHypers, config: MCMCConfig):
    """Log posterior of ARD length scales under the tophat prior."""
    valid = priors.ls_in_bounds(ls, config.max_ls)
    ls_s = jnp.clip(ls, 1e-6, config.max_ls)
    lp = config.marginal(
        x, y, mask, GPHypers(hypers.mean, hypers.amp2, hypers.noise, ls_s),
        config.kernel,
    )
    return jnp.where(valid, lp, -jnp.inf)


def _joint_prior_terms(amp2, noise, config: MCMCConfig):
    """The prior terms separating the joint-move log posterior from the
    bare GP log-marginal at an in-bounds state."""
    t = priors.lognormal_amp2_term(amp2, config.amp2_scale)
    if not config.noiseless:
        t = t + priors.horseshoe_logpdf(noise, config.noise_scale)
    return t


@partial(jax.jit, static_argnames=("config",))
def sample_hypers_lp(
    key: jax.Array,
    hypers: GPHypers,
    lp_mar: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    config: MCMCConfig = MCMCConfig(),
):
    """One full hyperparameter sweep, carrying the GP log-marginal.

    ``lp_mar`` is ``config.marginal`` evaluated at ``hypers`` (from the
    previous sweep's ls move, or one explicit evaluation at the start
    of a scan — see ``marginal_at``).  Both slice moves then skip their
    initial O(n³) evaluation: the joint move's log posterior at the
    current state is lp_mar + prior terms, and the ls move's tophat
    posterior at the post-joint state is the joint move's accepted lp
    minus the same terms.  Returns ``(hypers', lp_mar')`` with the
    carry valid for the next sweep on unchanged data.

    With ``config.band_joint`` the carry is IGNORED (each move re-seeds
    its own lp0 through its own numerical path — see the band-mode
    comments below); callers may pass a dummy and XLA dead-code-
    eliminates their seed evaluation.
    """
    k_joint, k_ls = jax.random.split(key)

    if config.noiseless:
        vec0 = jnp.stack([hypers.mean, hypers.amp2])
    else:
        vec0 = jnp.stack([hypers.mean, hypers.amp2, hypers.noise])

    if config.band_joint:
        # Band mode: one O(n³)-GEMM reduction of M per move, O(n·b²)
        # per evaluation (ops/band).  lp0 is re-evaluated through the
        # banded path itself (None → one cheap banded eval inside the
        # move) so threshold comparisons stay internally consistent —
        # a carried fused-path lp0 would differ by the two paths' f32
        # rounding and bias the accept decisions near the threshold.
        from spearmint_tpu.ops.band import band_marginal_factory

        marginal3 = band_marginal_factory(x, y, mask, hypers.ls,
                                          config.kernel,
                                          config.band_block)

        def joint_lp(vec):
            return _joint_logprob(vec, x, y, mask, hypers.ls, config,
                                  marginal3=marginal3)

        lp0_joint = None
    else:
        def joint_lp(vec):
            return _joint_logprob(vec, x, y, mask, hypers.ls, config)

        lp0_joint = lp_mar + _joint_prior_terms(hypers.amp2, hypers.noise,
                                                config)
    vec, lp_joint = slice_sample(k_joint, vec0, joint_lp, compwise=False,
                                 lp0=lp0_joint, with_lp=True)
    mean, amp2 = vec[0], vec[1]
    noise = (
        jnp.asarray(priors.DEFAULT_NOISE, vec.dtype)
        if config.noiseless
        else vec[2]
    )

    mid = GPHypers(mean, amp2, noise, hypers.ls)

    def ls_lp(ls):
        return _ls_logprob(ls, x, y, mask, mid, config)

    # Band mode: the joint move's accepted lp came from the banded
    # path; re-seed the ls move through its own (fused) path instead of
    # carrying a cross-path value (one extra fused evaluation per
    # sweep, ~54 ms at the flagship shape — consistency over latency).
    lp0_ls = (None if config.band_joint
              else lp_joint - _joint_prior_terms(amp2, noise, config))
    ls, lp_ls = slice_sample(k_ls, hypers.ls, ls_lp, compwise=True,
                             lp0=lp0_ls, with_lp=True)
    return GPHypers(mean, amp2, noise, ls), lp_ls


def marginal_at(x, y, mask, hypers: GPHypers, config: MCMCConfig):
    """One explicit carry-seed evaluation of ``config.marginal``."""
    return config.marginal(x, y, mask, hypers, config.kernel)


@partial(jax.jit, static_argnames=("config",))
def sample_hypers(
    key: jax.Array,
    hypers: GPHypers,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    config: MCMCConfig = MCMCConfig(),
) -> GPHypers:
    """One full hyperparameter sweep of a single chain."""
    lp_mar = marginal_at(x, y, mask, hypers, config)
    out, _ = sample_hypers_lp(key, hypers, lp_mar, x, y, mask, config)
    return out


def sample_hypers_batch(
    keys: jax.Array,
    hypers: GPHypers,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    config: MCMCConfig = MCMCConfig(),
) -> GPHypers:
    """vmap of ``sample_hypers`` over a leading chains axis of keys/hypers."""
    return jax.vmap(
        lambda k, h: sample_hypers(k, h, x, y, mask, config)
    )(keys, hypers)


@partial(jax.jit, static_argnames=("config", "steps"))
def burnin(
    key: jax.Array,
    hypers: GPHypers,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    steps: int,
    config: MCMCConfig = MCMCConfig(),
) -> GPHypers:
    """Reference burn-in (≈100 sweeps at first init), one chain."""
    lp0 = marginal_at(x, y, mask, hypers, config)

    def body(carry, k):
        h, lp = carry
        h2, lp2 = sample_hypers_lp(k, h, lp, x, y, mask, config)
        return (h2, lp2), None

    keys = jax.random.split(key, steps)
    (out, _), _ = jax.lax.scan(body, (hypers, lp0), keys)
    return out
