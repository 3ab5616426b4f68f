"""ctypes bindings for the native C++ components.

Self-building: if ``libspearmint_native.so`` is absent next to the
sources, a one-shot ``make`` is attempted (g++ is in the image); any
failure degrades silently to the pure-Python/SciPy fallbacks — native
code is an accelerator here, never a hard dependency (the reference's
analogous tier is the procmail ``lockfile`` binary + protoc, SURVEY.md
§2a).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libspearmint_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.spearmint_sobol.restype = ctypes.c_int
        lib.spearmint_sobol.argtypes = [
            ctypes.c_int, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.spearmint_sobol_max_dim.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def sobol_max_dim() -> int:
    lib = _load()
    return lib.spearmint_sobol_max_dim() if lib else 0


def sobol_generate(num_dims: int, n: int, skip: int):
    """Native Sobol points, or None if unsupported/unavailable."""
    lib = _load()
    if lib is None or num_dims > lib.spearmint_sobol_max_dim():
        return None
    out = np.empty((n, num_dims), dtype=np.float64)
    rc = lib.spearmint_sobol(
        num_dims, n, skip,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return out
