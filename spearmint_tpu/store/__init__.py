from spearmint_tpu.store import codec, experiment, locker, sobol  # noqa: F401
