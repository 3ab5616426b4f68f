"""Driver registry.

Parity: reference ``driver/__init__.py`` + ``dispatch.py`` (SURVEY.md §2
#9): name → driver module with ``submit_job(job) -> proc_id`` and
``is_alive(proc_id) -> bool``.
"""

from __future__ import annotations

import importlib

_KNOWN = ("local", "sge", "fake")


def get_driver(name: str):
    try:
        module = importlib.import_module(
            f"spearmint_tpu.harness.drivers.{name}"
        )
    except ImportError as e:
        raise ValueError(f"unknown driver {name!r}; known: {_KNOWN}") from e
    return module.init()
