from spearmint_tpu.mcmc import slice as slice_sampler  # noqa: F401
from spearmint_tpu.mcmc import chains  # noqa: F401
