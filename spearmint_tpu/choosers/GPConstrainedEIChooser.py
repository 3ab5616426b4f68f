"""Constrained GP-EI chooser.

Parity: reference ``chooser/GPConstrainedEIChooser.py`` (≈500 LoC,
SURVEY.md §2 #17): observations whose objective came back NaN are
constraint violations; a latent probit GP classifies feasibility and
weights EI (engine/constrained.py).  Host duties as in the flagship:
padding, per-chain state persistence (value hypers AND the constraint
model — the reference pickles all chooser state, SURVEY.md §5.4),
burn-in on first init, tuple protocol.
"""

from __future__ import annotations

import os
import time

import numpy as np

from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser
from spearmint_tpu.utils.args import unpack_args


def init(expt_dir, arg_string=""):
    return GPConstrainedEIChooser(expt_dir, **unpack_args(arg_string))


class GPConstrainedEIChooser(GPEIOptChooser):
    def __init__(self, expt_dir, **kwargs):
        super().__init__(expt_dir, **kwargs)
        self._constraint = None

    # ------------------------------------------------------ state io
    # Overrides persist the constraint model alongside the value hypers
    # in the same npz; the reference pickles everything the chooser
    # holds, so a resumed run continues the latent chains rather than
    # silently restarting them.
    def _load_state(self, ndim):
        import jax.numpy as jnp

        from spearmint_tpu.core.likelihood import GPHypers
        from spearmint_tpu.engine.constrained import ConstraintState

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
                        if "c_ls" in z:
                            self._constraint = ConstraintState(
                                ls=jnp.array(z["c_ls"]),
                                amp2=jnp.array(z["c_amp2"]),
                                ff=jnp.array(z["c_ff"]),
                            )
                        self._key_state = int(z["key_state"])
                        self._burned_in = bool(z["burned_in"])
                        return
        self._key_state = self.seed
        self._burned_in = False

    def _save_state(self):
        h, c = self._hypers, self._constraint
        with self.locker:
            tmp = self.state_file + ".tmp.npz"
            np.savez(
                tmp,
                mean=np.asarray(h.mean), amp2=np.asarray(h.amp2),
                noise=np.asarray(h.noise), ls=np.asarray(h.ls),
                c_ls=np.asarray(c.ls), c_amp2=np.asarray(c.amp2),
                c_ff=np.asarray(c.ff),
                key_state=self._key_state, burned_in=self._burned_in,
            )
            os.replace(tmp, self.state_file)

    # ------------------------------------------------------ the protocol
    def next(self, grid, values, durations, candidates, pending, complete):
        if len(complete) < 2:
            return int(candidates[0])

        import jax
        import jax.numpy as jnp

        from spearmint_tpu.core.linalg import pad_bucket
        from spearmint_tpu.engine.constrained import (
            burnin_constraint_states,
            init_constraint_states,
            suggest_step_constrained,
        )
        from spearmint_tpu.engine.suggest import (
            SuggestConfig,
            init_chain_states,
        )
        from spearmint_tpu.utils.platform import ensure_backend

        ensure_backend()

        grid = np.asarray(grid)
        ndim = grid.shape[1]
        comp = grid[complete].astype(np.float32)
        vals_raw = np.asarray(values)[complete].astype(np.float64)
        valid = np.isfinite(vals_raw)
        if valid.sum() < 2:
            # nothing feasible yet: keep exploring the grid
            return int(candidates[0])
        vals = np.where(valid, vals_raw, 0.0).astype(np.float32)
        cand = grid[candidates].astype(np.float32)

        n = comp.shape[0]
        pad = pad_bucket(n)
        xp = np.zeros((pad, ndim), np.float32); xp[:n] = comp
        yp = np.zeros(pad, np.float32); yp[:n] = vals
        obs_mask = np.arange(pad) < n
        valid_mask = np.zeros(pad, bool); valid_mask[:n] = valid

        c = cand.shape[0]
        cpad = pad_bucket(c, minimum=64)
        cand_p = np.zeros((cpad, ndim), np.float32); cand_p[:c] = cand
        cand_mask = np.arange(cpad) < c

        xj, yj = jnp.array(xp), jnp.array(yp)
        vm, om = jnp.array(valid_mask), jnp.array(obs_mask)
        zj = jnp.where(vm, 1.0, -1.0).astype(xj.dtype)

        self._load_state(ndim)
        key = jax.random.PRNGKey(self._key_state)
        if self._hypers is None:
            self._hypers = init_chain_states(yj, vm, ndim, self.chains)
        if self._constraint is None:
            self._constraint = init_constraint_states(ndim, pad, self.chains)
        elif self._constraint.ff.shape[1] != pad:
            # Observation bucket grew/shrank: re-pad the latent vectors,
            # keeping the aligned prefix (latents follow observation
            # order) so chains continue rather than restart.
            ff_old = np.asarray(self._constraint.ff)
            ff = np.zeros((self.chains, pad), ff_old.dtype)
            keep = min(pad, ff_old.shape[1])
            ff[:, :keep] = ff_old[:, :keep]
            self._constraint = self._constraint._replace(ff=jnp.array(ff))
        if not self._burned_in and self.burnin_steps > 0:
            key, kb, kc = jax.random.split(key, 3)
            self._hypers = self._burn_chains(kb, self._hypers, xj, yj, vm)
            self._constraint = burnin_constraint_states(
                kc, self._constraint, xj, zj, om, self.burnin_steps)
            self._burned_in = True

        # mcmc_iters = samples per suggestion, spread across chains
        # (see GPEIOptChooser.next).
        iters_per_chain = max(1, -(-self.mcmc_iters // self.chains))
        # Same auto memory policy as the flagship (GPEIOptChooser
        # ._memory_policy): bound live [K, N, N] temps at large pads.
        chain_chunk, explicit_inv = self._memory_policy(pad)
        cfg = SuggestConfig(
            mcmc_iters=iters_per_chain,
            noiseless=self.noiseless,
            kernel_name=self.covar,
            grid_subset=self.grid_subset,
            lbfgs_iters=self.lbfgs_iters,
            optimize=self.optimize,
            chain_chunk=chain_chunk,
            explicit_inverse=explicit_inv,
        )
        key, ks = jax.random.split(key)
        t0 = time.perf_counter()
        res = suggest_step_constrained(
            ks, self._hypers, self._constraint, xj, yj, vm, om,
            jnp.array(cand_p), jnp.array(cand_mask), cfg,
        )
        jax.block_until_ready(res.acq)
        latency = time.perf_counter() - t0
        self._hypers = res.hypers
        self._constraint = res.constraint
        self._key_state += 1
        self._save_state()
        n_ok = int(res.n_ok) if res.n_ok is not None else -1
        self._emit_suggest(
            latency, n, 0, c,
            acq_best=float(res.best_cand_acq), acq_opt=float(res.acq_opt),
            n_valid=int(valid.sum()),
            c_amp2_med=float(np.median(np.asarray(res.constraint.amp2))),
            mode="chains", chain_chunk=chain_chunk, n_ok=n_ok,
        )
        if n_ok == 0:
            # all cache factorizations failed — the average carries no
            # signal (see GPEIOptChooser.next): fall back to grid order
            self.events.emit("suggest_degenerate",
                             chooser=type(self).__name__, n_obs=int(n))
            return int(candidates[0])

        acq_opt = float(res.acq_opt)
        best_cand_acq = float(res.best_cand_acq)
        x_opt = np.asarray(res.x_opt, dtype=np.float64)
        if self.optimize and acq_opt > best_cand_acq and np.all(
                np.isfinite(x_opt)):
            return float(acq_opt), x_opt
        return int(candidates[int(res.best_cand)])
