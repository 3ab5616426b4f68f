"""Test harness config: force CPU with 8 virtual devices BEFORE jax import.

SURVEY.md §4: distributed tests without hardware use
``--xla_force_host_platform_device_count=8`` to fake an 8-device mesh.
"""

import os

# Force (not setdefault): the session env presets JAX_PLATFORMS=axon (the
# real TPU tunnel), which tests must not use.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize calls axon.register(), which overrides
# jax_platforms to "axon,cpu" regardless of the env var — undo that so
# tests never touch the remote-TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
