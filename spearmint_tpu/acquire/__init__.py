from spearmint_tpu.acquire import ei, fantasy, optimize  # noqa: F401
