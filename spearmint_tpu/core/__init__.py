from spearmint_tpu.core import kernels, linalg, likelihood, priors  # noqa: F401
