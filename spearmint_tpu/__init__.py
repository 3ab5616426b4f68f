"""spearmint_tpu — a TPU-native Bayesian-optimization engine.

A brand-new framework (JAX/XLA/Pallas/pjit) with the capabilities of the
JasperSnoek/spearmint experiment harness: fully-Bayesian Gaussian-process
regression (Matérn-5/2 ARD kernels, slice-sampling MCMC over
hyperparameters), EI and EI-per-second acquisition with gradient-based
off-grid optimization, pending-job fantasization for asynchronous parallel
suggestion, a Sobol candidate grid, a protobuf-text-format experiment DSL,
and pluggable job drivers with crash-resumable on-disk state.

Unlike the CPU/NumPy reference, every log-marginal-likelihood,
slice-sampling step, EI evaluation and EI gradient runs on-chip:
hyperparameter chains are vmapped and shardable across a multi-host TPU
mesh (`chains` axis), candidate batches are shardable over a `cand` axis
with global argmax via collectives, and the kernel-matrix hot path has a
Pallas implementation.

Layout (see SURVEY.md §7):
  core/     kernels, masked linear algebra, GP log-marginal, priors
  mcmc/     jittable stepping-out/shrinking slice sampler, chain states
  acquire/  EI, EI-per-second, fantasization, batched L-BFGS-B
  engine/   the end-to-end jitted suggest step + mesh/sharding
  store/    Sobol grid, experiment state store, config/job codec, locking
  harness/  async main loop, sync loop, lite interface, runner, drivers
  choosers/ reference-protocol chooser modules (GPEIOptChooser, ...)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU matmuls default to single-pass bf16 (~8 mantissa bits).  For a
# Bayesian-numerics engine that is not a tuning knob, it is silent
# corruption: posterior variances are small differences of O(amp2)
# quantities (var = amp2·(1+ε) − Σβ², with var/amp2 down at 1e-4), and
# bf16 β made variances NEGATIVE at realistic hyperparameters — caught
# by tests/test_tpu_smoke.py against float64 golden math (r4).  bf16_3x
# ("high", ~f32-grade for these magnitudes at 3 MXU passes instead of
# 6) is the library-wide floor; the variance-critical posterior GEMMs
# additionally pin Precision.HIGHEST explicitly (acquire/ei.py,
# acquire/fantasy.py, engine/constrained.py, engine/obs_shard.py).
# CPU is unaffected (always f32).
_jax.config.update("jax_default_matmul_precision", "high")
