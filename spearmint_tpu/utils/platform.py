"""Backend selection resilience.

The TPU attach in this environment is exclusive: if another process holds
the chip, backend initialization raises and — because the session env
pins ``JAX_PLATFORMS`` to the TPU platform — JAX will NOT fall back to
CPU on its own.  A suggestion engine that dies because the chip is busy
is useless to the harness, so every host entry point calls
``ensure_backend()`` once: probe the configured platform, and on failure
drop to CPU with a warning.

Override order: ``SPEARMINT_TPU_PLATFORM`` env var (if set, forced) →
configured platform → CPU fallback.
"""

from __future__ import annotations

import os
import sys

_checked = False


def ensure_backend() -> str:
    """Returns the platform name actually in use."""
    global _checked
    import jax

    forced = os.environ.get("SPEARMINT_TPU_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
        _checked = True
        return jax.devices()[0].platform

    if _checked:
        return jax.devices()[0].platform
    try:
        platform = jax.devices()[0].platform
    except RuntimeError as e:
        print(
            f"[spearmint_tpu] accelerator backend unavailable ({e}); "
            "falling back to CPU", file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
    _checked = True
    return platform
