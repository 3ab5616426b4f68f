"""Constrained GP-EI chooser.

Parity: reference ``chooser/GPConstrainedEIChooser.py`` (≈500 LoC,
SURVEY.md §2 #17): observations whose objective came back NaN are
constraint violations; a latent probit GP classifies feasibility and
weights EI (engine/constrained.py).  Host duties as in the flagship:
padding, per-chain constraint-state persistence, tuple protocol.
"""

from __future__ import annotations

import os

import numpy as np

from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser
from spearmint_tpu.utils.args import unpack_args


def init(expt_dir, arg_string=""):
    return GPConstrainedEIChooser(expt_dir, **unpack_args(arg_string))


class GPConstrainedEIChooser(GPEIOptChooser):
    def __init__(self, expt_dir, **kwargs):
        super().__init__(expt_dir, **kwargs)
        self._constraint = None

    def next(self, grid, values, durations, candidates, pending, complete):
        if len(complete) < 2:
            return int(candidates[0])

        import jax
        import jax.numpy as jnp

        from spearmint_tpu.core.linalg import pad_bucket
        from spearmint_tpu.engine.constrained import (
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

        self._load_state(ndim)
        key = jax.random.PRNGKey(self._key_state)
        if self._hypers is None:
            self._hypers = init_chain_states(yj, vm, ndim, self.chains)
            self._burned_in = True
        if (self._constraint is None
                or self._constraint.ff.shape[1] != pad):
            self._constraint = init_constraint_states(ndim, pad, self.chains)

        # mcmc_iters = samples per suggestion, spread across chains
        # (see GPEIOptChooser.next).
        iters_per_chain = max(1, -(-self.mcmc_iters // self.chains))
        cfg = SuggestConfig(
            mcmc_iters=iters_per_chain,
            noiseless=self.noiseless,
            kernel_name=self.covar,
            grid_subset=self.grid_subset,
            lbfgs_iters=self.lbfgs_iters,
            optimize=self.optimize,
        )
        key, ks = jax.random.split(key)
        res = suggest_step_constrained(
            ks, self._hypers, self._constraint, xj, yj, vm, om,
            jnp.array(cand_p), jnp.array(cand_mask), cfg,
        )
        self._hypers = res.hypers
        self._constraint = res.constraint
        self._key_state += 1
        self._save_state()

        acq_opt = float(res.acq_opt)
        best_cand_acq = float(res.best_cand_acq)
        x_opt = np.asarray(res.x_opt, dtype=np.float64)
        if self.optimize and acq_opt > best_cand_acq and np.all(
                np.isfinite(x_opt)):
            return float(acq_opt), x_opt
        return int(candidates[int(res.best_cand)])
