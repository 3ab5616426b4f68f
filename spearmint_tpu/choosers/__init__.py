"""Chooser registry.

Parity: reference ``main.py`` loads choosers dynamically
(``__import__('chooser.' + name)``, then ``module.init(expt_dir, args)``)
— SURVEY.md §1 L5→L3 interface.  Same protocol here: every chooser module
exposes ``init(expt_dir, arg_string) -> chooser`` and the chooser exposes
``next(grid, values, durations, candidates, pending, complete)`` returning
either an int grid index or a ``(ei_value, new_point)`` tuple for an
off-grid invention.
"""

from __future__ import annotations

import importlib

_KNOWN = (
    "GPEIOptChooser",
    "GPEIperSecChooser",
    "GPEIChooser",
    "GPConstrainedEIChooser",
    "RandomChooser",
    "SequentialChooser",
    "GridChooser",
    "RandomForestEIChooser",
)


def get_chooser(name: str, expt_dir: str, arg_string: str = ""):
    """Resolve a chooser module by name and initialize it."""
    try:
        module = importlib.import_module(f"spearmint_tpu.choosers.{name}")
    except ImportError as e:
        raise ValueError(
            f"unknown chooser {name!r}; known: {_KNOWN}"
        ) from e
    return module.init(expt_dir, arg_string)
