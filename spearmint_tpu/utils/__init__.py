from spearmint_tpu.utils.args import unpack_args  # noqa: F401
