"""Cost-aware GP chooser: expected improvement per second.

Parity: reference ``chooser/GPEIperSecChooser.py`` (≈450 LoC, SURVEY.md
§2 #4) — mirror of GPEIOptChooser with a second GP over log durations
and acquisition EI/sec (engine/per_sec.py).  Same host-shell duties:
padding, dual chain-state persistence, tuple protocol for off-grid
points.
"""

from __future__ import annotations

import os

import numpy as np

from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser
from spearmint_tpu.utils.args import unpack_args


def init(expt_dir, arg_string=""):
    return GPEIperSecChooser(expt_dir, **unpack_args(arg_string))


class GPEIperSecChooser(GPEIOptChooser):
    def __init__(self, expt_dir, **kwargs):
        super().__init__(expt_dir, **kwargs)
        self._time_hypers = None

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
                        self._time_hypers = GPHypers(
                            mean=jnp.array(z["time_mean"]),
                            amp2=jnp.array(z["time_amp2"]),
                            noise=jnp.array(z["time_noise"]),
                            ls=jnp.array(z["time_ls"]),
                        )
                        self._key_state = int(z["key_state"])
                        self._burned_in = bool(z["burned_in"])
                        return
        self._key_state = self.seed
        self._burned_in = False

    def _save_state(self):
        h, t = self._hypers, self._time_hypers
        with self.locker:
            tmp = self.state_file + ".tmp.npz"
            np.savez(
                tmp,
                mean=np.asarray(h.mean), amp2=np.asarray(h.amp2),
                noise=np.asarray(h.noise), ls=np.asarray(h.ls),
                time_mean=np.asarray(t.mean), time_amp2=np.asarray(t.amp2),
                time_noise=np.asarray(t.noise), time_ls=np.asarray(t.ls),
                key_state=self._key_state, burned_in=self._burned_in,
            )
            os.replace(tmp, self.state_file)

    def next(self, grid, values, durations, candidates, pending, complete):
        if len(complete) < 2:
            return int(candidates[0])

        import jax
        import jax.numpy as jnp

        from spearmint_tpu.core.linalg import pad_bucket
        from spearmint_tpu.engine.per_sec import suggest_step_per_sec
        from spearmint_tpu.engine.suggest import (
            SuggestConfig,
            init_chain_states,
        )
        from spearmint_tpu.utils.platform import ensure_backend

        ensure_backend()

        grid = np.asarray(grid)
        ndim = grid.shape[1]
        comp = grid[complete].astype(np.float32)
        vals = np.asarray(values)[complete].astype(np.float32)
        durs = np.asarray(durations)[complete].astype(np.float64)
        # Reference models log durations; clamp so instant jobs (or
        # missing durations) don't produce -inf.
        log_durs = np.log(np.maximum(np.nan_to_num(durs, nan=1.0),
                                     1e-3)).astype(np.float32)
        pend = grid[pending].astype(np.float32)
        cand = grid[candidates].astype(np.float32)

        n = comp.shape[0]
        pad = pad_bucket(n)
        xp = np.zeros((pad, ndim), np.float32); xp[:n] = comp
        yp = np.zeros(pad, np.float32); yp[:n] = vals
        tp = np.zeros(pad, np.float32); tp[:n] = log_durs
        mask = np.arange(pad) < n

        p = pend.shape[0]
        # shared fused-eligibility rule (see GPEIOptChooser.next)
        from spearmint_tpu.core.linalg import pend_pad

        ppad = pend_pad(pad, p)
        pend_p = np.zeros((ppad, ndim), np.float32); pend_p[:p] = pend
        pend_mask = np.arange(ppad) < p

        c = cand.shape[0]
        cpad = pad_bucket(c, minimum=64)
        cand_p = np.zeros((cpad, ndim), np.float32); cand_p[:c] = cand
        cand_mask = np.arange(cpad) < c

        xj, yj, tj, mj = (jnp.array(xp), jnp.array(yp), jnp.array(tp),
                          jnp.array(mask))

        self._load_state(ndim)
        key = jax.random.PRNGKey(self._key_state)
        if self._hypers is None:
            self._hypers = init_chain_states(yj, mj, ndim, self.chains)
            self._time_hypers = init_chain_states(tj, mj, ndim, self.chains)
        if not self._burned_in and self.burnin_steps > 0:
            # Reference parity: GPEIperSecChooser mirrors the flagship's
            # _real_init burn-in for BOTH hyperparameter families, so the
            # first cost-aware suggestions come from mixed chains.
            key, kb, kt = jax.random.split(key, 3)
            self._hypers = self._burn_chains(kb, self._hypers, xj, yj, mj)
            self._time_hypers = self._burn_chains(
                kt, self._time_hypers, xj, tj, mj)
            self._burned_in = True

        # mcmc_iters = samples per suggestion, spread across chains
        # (see GPEIOptChooser.next).
        iters_per_chain = max(1, -(-self.mcmc_iters // self.chains))
        # Same auto memory policy as the flagship (GPEIOptChooser
        # ._memory_policy): bound live [K, N, N] temps at large pads.
        chain_chunk, explicit_inv = self._memory_policy(pad)
        ndev = len(jax.devices())
        # Shared large-n routing gate (engine/obs_shard.use_obs_gate):
        # at obs_shard_min+ pads on a multi-device mesh, BOTH of this
        # chooser's n×n working sets (value GP and duration GP) shard
        # over the obs axis instead of replicating per device.
        from spearmint_tpu.engine.obs_shard import use_obs_gate

        use_obs = use_obs_gate(self.obs_shard_min, ndev, pad, p)
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
        )
        import time as _time

        key, ks = jax.random.split(key)
        t0 = _time.perf_counter()
        if use_obs:
            res = self._obs_suggest_fn(cfg, "sharded_suggest_per_sec")(
                ks, self._hypers, self._time_hypers, xj, yj, tj, mj,
                jnp.array(cand_p), jnp.array(cand_mask),
            )
        else:
            res = suggest_step_per_sec(
                ks, self._hypers, self._time_hypers, xj, yj, tj, mj,
                jnp.array(pend_p), jnp.array(pend_mask),
                jnp.array(cand_p), jnp.array(cand_mask), cfg,
            )
        jax.block_until_ready(res.ei_per_s)
        latency = _time.perf_counter() - t0
        self._hypers = res.hypers
        self._time_hypers = res.time_hypers
        self._key_state += 1
        self._save_state()
        n_ok = int(res.n_ok) if res.n_ok is not None else -1
        self._emit_suggest(
            latency, n, p, c,
            ei_best=float(res.best_cand_ei), ei_opt=float(res.ei_opt),
            time_amp2_med=float(np.median(np.asarray(res.time_hypers.amp2))),
            mode="obs_shard" if use_obs else "chains",
            chain_chunk=chain_chunk, n_ok=n_ok,
        )
        if n_ok == 0:
            # all cache factorizations failed — the average carries no
            # signal (see GPEIOptChooser.next): fall back to grid order
            self.events.emit("suggest_degenerate",
                             chooser=type(self).__name__, n_obs=int(n))
            return int(candidates[0])

        ei_opt = float(res.ei_opt)
        best_cand_ei = float(res.best_cand_ei)
        x_opt = np.asarray(res.x_opt, dtype=np.float64)
        if self.optimize and ei_opt > best_cand_ei and np.all(
                np.isfinite(x_opt)):
            return float(ei_opt), x_opt
        return int(candidates[int(res.best_cand)])
