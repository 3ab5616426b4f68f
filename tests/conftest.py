"""Test harness config: force CPU with 8 virtual devices BEFORE jax import.

SURVEY.md §4: distributed tests without hardware use
``--xla_force_host_platform_device_count=8`` to fake an 8-device mesh.

Exception: ``SPEARMINT_TPU_TESTS=1`` keeps the real TPU backend so the
TPU-only smoke tests (tests/test_tpu_smoke.py — fused-kernel numerics at
production lowering) can run on attached hardware:
    SPEARMINT_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py
"""

import os

_TPU_TESTS = os.environ.get("SPEARMINT_TPU_TESTS", "0") == "1"

if not _TPU_TESTS:
    # Force (not setdefault): the session env presets JAX_PLATFORMS=axon
    # (the real TPU tunnel), which CI tests must not use.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_TESTS:
    # The image's sitecustomize calls axon.register(), which overrides
    # jax_platforms to "axon,cpu" regardless of the env var — undo that
    # so tests never touch the remote-TPU tunnel.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
