"""GP-EI chooser with off-grid EI optimization — the flagship.

Parity: reference ``chooser/GPEIOptChooser.py`` (≈480 LoC, SURVEY.md §2
#3): fully-Bayesian Matérn-5/2 GP, slice-sampled hyperparameters
(horseshoe noise / lognormal amp2 / tophat ls priors), EI averaged over
hyperparameter samples, pending-job fantasization, L-BFGS off-grid EI
refinement, and state checkpointing under the store lock.

TPU-native differences (design, not behavior):
  * the reference's ONE persistent sequential chain becomes ``chains``
    independent vmapped chains (default 10), each advanced ``mcmc_iters``
    steps per call — total EI-averaging samples = chains × mcmc_iters;
  * all numerics live in one jitted ``suggest_step`` (engine/suggest.py);
    this class is a thin host shell doing padding, state io, and the
    grid-index bookkeeping;
  * observation arrays are padded to power-of-two buckets so XLA compiles
    O(log n) programs over an experiment's lifetime.
"""

from __future__ import annotations

import os

import numpy as np

from spearmint_tpu.store.locker import Locker
from spearmint_tpu.utils.args import unpack_args


def init(expt_dir, arg_string=""):
    return GPEIOptChooser(expt_dir, **unpack_args(arg_string))


class GPEIOptChooser:
    def __init__(
        self,
        expt_dir,
        covar="Matern52",
        mcmc_iters=10,
        pending_samples=100,   # fantasy draws per hyper sample (reference
                               # default; becomes the batched fantasy axis)
        noiseless=0,
        burnin=100,
        grid_subset=20,
        chains=10,
        lbfgs_iters=50,
        max_obs_pad=None,
        seed=0,
        profile_dir="",
        obs_shard_min=8192,    # pad size from which the n×n working set
                               # shards over an `obs` device mesh
                               # (engine/obs_shard); 0 disables
        chain_chunk=-1,        # -1: auto memory policy (see next());
                               # 0: plain vmap; >0: explicit group size
        explicit_inverse=-1,   # -1: auto (off at large pad); 0/1 force
        band_joint_min=0,      # pad size from which the joint slice
                               # move runs through the per-move band
                               # reduction (ops/band).  DEFAULT OFF:
                               # r5 measured the XLA-level evaluators
                               # at break-even vs the fused dense
                               # kernel and the Mosaic cyclic-reduction
                               # kernel hangs this toolchain's compile
                               # (docs/PROFILE_r5.md has the full
                               # decision tree); the knob remains for
                               # experiments and future toolchains
    ):
        self.expt_dir = expt_dir
        self.covar = str(covar)
        self.mcmc_iters = int(mcmc_iters)
        self.pending_samples = int(pending_samples)
        self.noiseless = bool(int(noiseless))
        self.burnin_steps = int(burnin)
        self.grid_subset = int(grid_subset)
        self.chains = int(chains)
        self.lbfgs_iters = int(lbfgs_iters)
        self.max_obs_pad = max_obs_pad
        self.obs_shard_min = int(obs_shard_min)
        self.chain_chunk = int(chain_chunk)
        self.explicit_inverse = int(explicit_inverse)
        self.band_joint_min = int(band_joint_min)
        self._obs_suggest = None  # (cfg, ndev, fn) compile cache
        self.seed = int(seed)
        self.optimize = True  # GPEIChooser subclass flips this off
        self.profile_dir = str(profile_dir)  # jax.profiler traces per call
        self.state_file = os.path.join(
            expt_dir, f"{type(self).__name__}_state.npz"
        )
        self.locker = Locker(self.state_file)
        from spearmint_tpu.utils.events import EventLog

        self.events = EventLog(expt_dir)
        self._hypers = None     # GPHypers pytree, leading chains axis
        self._key = None
        self._burned_in = False

    # ------------------------------------------------------ state io
    def _load_state(self, ndim):
        import jax.numpy as jnp

        from spearmint_tpu.core.likelihood import GPHypers

        if self._hypers is not None:
            return
        with self.locker:
            if os.path.exists(self.state_file):
                with np.load(self.state_file) as z:
                    if z["ls"].shape == (self.chains, ndim):
                        self._hypers = GPHypers(
                            mean=jnp.array(z["mean"]),
                            amp2=jnp.array(z["amp2"]),
                            noise=jnp.array(z["noise"]),
                            ls=jnp.array(z["ls"]),
                        )
                        self._key_state = int(z["key_state"])
                        self._burned_in = bool(z["burned_in"])
                        return
        self._key_state = self.seed
        self._burned_in = False

    def _save_state(self):
        h = self._hypers
        with self.locker:
            tmp = self.state_file + ".tmp.npz"
            np.savez(
                tmp,
                mean=np.asarray(h.mean), amp2=np.asarray(h.amp2),
                noise=np.asarray(h.noise), ls=np.asarray(h.ls),
                key_state=self._key_state, burned_in=self._burned_in,
            )
            os.replace(tmp, self.state_file)

    # ------------------------------------------------------ shared helpers
    def _burn_chains(self, key, hypers, xj, yj, mj):
        """Burn-in sweeps for one vmapped chain family (reference
        _real_init ≈L90: ~100 sweeps before the first suggestion)."""
        import jax

        from spearmint_tpu.mcmc.chains import MCMCConfig, sample_hypers

        mcfg = MCMCConfig(noiseless=self.noiseless)

        def burn_chain(k, h):
            def body(hh, kk):
                return sample_hypers(kk, hh, xj, yj, mj, mcfg), None

            out, _ = jax.lax.scan(
                body, h, jax.random.split(k, self.burnin_steps)
            )
            return out

        return jax.jit(jax.vmap(burn_chain))(
            jax.random.split(key, self.chains), hypers
        )

    def _memory_policy(self, pad):
        """Resolve (chain_chunk, explicit_inverse) for this bucket size.

        Auto mode bounds the live per-sweep HBM at ~2.5 GB of
        [chunk, pad, pad] f32 cov/chol temps — past ~8k observations a
        plain chains-vmap holds chains·pad²·4B at once and hits the HBM
        cliff (SURVEY.md §5.7a); chunking trades it for sequential chain
        groups.  L⁻¹ materialization stops paying at the same scale (an
        extra [S, pad, pad] buffer), so auto turns it off there too.
        """
        chunk = self.chain_chunk
        if chunk < 0:
            # 2 live [pad, pad] f32 buffers per in-flight chain: the
            # per-eval assembled M plus its factorization workspace
            # (the fused kernel destroys a copy; the XLA path holds
            # K and chol).
            per_chain = 2 * 4.0 * pad * pad
            c = int(min(self.chains, max(1, 2.5e9 // per_chain)))
            if c >= self.chains:
                chunk = 0
            else:
                while self.chains % c:
                    c -= 1
                chunk = c
        inv = self.explicit_inverse
        if inv < 0:
            inv = pad < 8192
        return chunk, bool(inv)

    def _obs_suggest_fn(self, cfg, factory_name="sharded_suggest_obs"):
        """Compile-cached obs-sharded suggestion (engine/obs_shard).

        ``factory_name`` selects the sharded step builder — the per-sec
        chooser passes its dual-GP variant (sharded_suggest_per_sec).
        """
        import jax

        from spearmint_tpu.engine import obs_shard

        ndev = len(jax.devices())
        key = (cfg, ndev, factory_name)
        if self._obs_suggest and self._obs_suggest[0] == key:
            return self._obs_suggest[1]
        mesh = obs_shard.make_obs_mesh()
        fn = getattr(obs_shard, factory_name)(mesh, cfg)
        self._obs_suggest = (key, fn)
        return fn

    def _emit_suggest(self, latency, n_obs, n_pending, n_cand, **extra):
        """North-star observability: every GP chooser logs its suggestion
        latency (SURVEY.md §5.1/§5.5)."""
        self.events.emit(
            "suggest", chooser=type(self).__name__,
            latency_s=round(latency, 4), n_obs=int(n_obs),
            n_pending=int(n_pending), n_cand=int(n_cand), **extra,
        )

    # ------------------------------------------------------ the protocol
    def next(self, grid, values, durations, candidates, pending, complete):
        # Bootstrap exactly like the reference: fewer than 2 completions →
        # just take the next grid candidate.
        if len(complete) < 2:
            return int(candidates[0])

        import jax
        import jax.numpy as jnp

        from spearmint_tpu.core.linalg import pad_bucket
        from spearmint_tpu.engine.suggest import (
            SuggestConfig,
            init_chain_states,
            suggest_step,
        )
        from spearmint_tpu.utils.platform import ensure_backend

        ensure_backend()

        grid = np.asarray(grid)
        ndim = grid.shape[1]
        comp = grid[complete].astype(np.float32)
        vals = np.asarray(values)[complete].astype(np.float32)
        # NaN objectives are constraint violations; this unconstrained
        # chooser simply drops them (GPConstrainedEIChooser models them).
        finite = np.isfinite(vals)
        if not np.all(finite):
            comp, vals = comp[finite], vals[finite]
            if comp.shape[0] < 2:
                return int(candidates[0])
        pend = grid[pending].astype(np.float32)
        cand = grid[candidates].astype(np.float32)

        n = comp.shape[0]
        pad = pad_bucket(n)
        if self.max_obs_pad:
            pad = min(pad, int(self.max_obs_pad))
            if n > pad:  # subsample most recent observations
                comp, vals = comp[-pad:], vals[-pad:]
                n = pad
        xp = np.zeros((pad, ndim), np.float32); xp[:n] = comp
        yp = np.zeros(pad, np.float32); yp[:n] = vals
        mask = np.arange(pad) < n

        p = pend.shape[0]
        # linalg.pend_pad keeps the AUGMENTED (pad+ppad) fantasy
        # factorization fused-kernel-eligible (one shared definition
        # with GPEIperSecChooser and bench.py).
        from spearmint_tpu.core.linalg import pend_pad

        ppad = pend_pad(pad, p)
        pend_p = np.zeros((ppad, ndim), np.float32)
        pend_p[:p] = pend
        pend_mask = np.arange(ppad) < p

        c = cand.shape[0]
        cpad = pad_bucket(c, minimum=64)
        cand_p = np.zeros((cpad, ndim), np.float32)
        cand_p[:c] = cand
        cand_mask = np.arange(cpad) < c

        xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)

        self._load_state(ndim)
        key = jax.random.PRNGKey(self._key_state)
        if self._hypers is None:
            self._hypers = init_chain_states(yj, mj, ndim, self.chains)
        if not self._burned_in and self.burnin_steps > 0:
            key, kb = jax.random.split(key)
            self._hypers = self._burn_chains(kb, self._hypers, xj, yj, mj)
            self._burned_in = True

        # Reference semantics: mcmc_iters = hyperparameter samples PER
        # SUGGESTION (its one chain loops that many times).  Spread the
        # same budget across parallel chains: iters/chain = ceil share.
        iters_per_chain = max(1, -(-self.mcmc_iters // self.chains))
        chain_chunk, explicit_inv = self._memory_policy(pad)
        ndev = len(jax.devices())
        # Large-n production path: shard the n×n working set over an
        # `obs` device mesh (BASELINE config 5) once a single device's
        # chains-vmap regime stops making sense.  One shared gate for
        # all GP choosers (engine/obs_shard.use_obs_gate).
        from spearmint_tpu.engine.obs_shard import use_obs_gate

        use_obs = use_obs_gate(self.obs_shard_min, ndev, pad, p)
        # Joint-move band mode (ops/band): per-move band reduction +
        # Mosaic cyclic-reduction evaluations.  TPU-only (the win is
        # the in-kernel column-issue cost; XLA-level evaluators
        # measured break-even) and large pads only (the
        # _effective_jitter floor bounds the CR algebra's O(cond·ε)
        # drift).  The obs-sharded path has its own marginal.
        use_band = (self.band_joint_min > 0
                    and pad >= self.band_joint_min
                    and pad % 128 == 0
                    and not use_obs
                    and jax.default_backend() == "tpu")
        cfg = SuggestConfig(
            mcmc_iters=iters_per_chain,
            noiseless=self.noiseless,
            kernel_name=self.covar,
            grid_subset=self.grid_subset,
            lbfgs_iters=self.lbfgs_iters,
            optimize=self.optimize,
            has_pending=p > 0,
            n_fantasies=self.pending_samples,
            chain_chunk=chain_chunk,
            explicit_inverse=explicit_inv,
            band_joint=use_band,
        )
        import contextlib
        import time as _time

        key, ks = jax.random.split(key)
        trace = (jax.profiler.trace(self.profile_dir)
                 if self.profile_dir else contextlib.nullcontext())
        t0 = _time.perf_counter()
        with trace:
            if use_obs:
                res = self._obs_suggest_fn(cfg)(
                    ks, self._hypers, xj, yj, mj,
                    jnp.array(cand_p), jnp.array(cand_mask),
                )
            else:
                res = suggest_step(
                    ks, self._hypers, xj, yj, mj,
                    jnp.array(pend_p), jnp.array(pend_mask),
                    jnp.array(cand_p), jnp.array(cand_mask), cfg,
                )
            jax.block_until_ready(res.ei)
        latency = _time.perf_counter() - t0
        self._hypers = res.hypers
        self._key_state += 1
        self._save_state()
        n_ok = int(res.n_ok) if res.n_ok is not None else -1
        self._emit_suggest(
            latency, n, p, c,
            ei_best=float(res.best_cand_ei), ei_opt=float(res.ei_opt),
            amp2_med=float(np.median(np.asarray(res.hypers.amp2))),
            noise_med=float(np.median(np.asarray(res.hypers.noise))),
            mode="obs_shard" if use_obs else "chains", n_ok=n_ok,
        )
        if n_ok == 0:
            # Every sample's cache factorization failed (f32
            # conditioning edge): the averaged EI is all zeros and its
            # argmax carries no signal — fall back to grid order
            # instead of dispatching an arbitrary point, and say so.
            self.events.emit("suggest_degenerate",
                             chooser=type(self).__name__, n_obs=int(n))
            return int(candidates[0])

        best_cand_local = int(res.best_cand)
        best_cand_ei = float(res.best_cand_ei)
        ei_opt = float(res.ei_opt)
        x_opt = np.asarray(res.x_opt, dtype=np.float64)

        # Reference decision: take the optimized point only if it beats
        # the best grid candidate's EI.
        if self.optimize and ei_opt > best_cand_ei and np.all(np.isfinite(x_opt)):
            return float(ei_opt), x_opt
        return int(candidates[best_cand_local])
