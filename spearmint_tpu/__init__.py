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
