from spearmint_tpu.engine import suggest, mesh  # noqa: F401
