"""Native (C++) host-side components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these are the host-runtime pieces
(data baking) in C++ with lazy in-tree builds and pure-Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbake.so")
_SRC = os.path.join(_DIR, "bake.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Build (once, lazily) and load the native baker; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.bake_task.restype = ctypes.c_int
            lib.bake_task.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def bake_task_native(text: str, max_pairs: int = 256):
    """Parse one ARC task JSON with the C++ baker.

    Returns ``(train_pairs, test_pairs)`` where each pair is
    ``(input_grid, output_grid)`` of *unpadded* int8 arrays, or None if the
    native path is unavailable / the file doesn't parse.
    """
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    grids = np.zeros((max_pairs, 2, 900), np.int8)
    dims = np.zeros((max_pairs, 2, 2), np.int32)
    splits = np.zeros((max_pairs,), np.int32)
    n = lib.bake_task(
        raw, len(raw),
        grids.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        splits.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_pairs)
    if n < 0:
        return None
    train, test = [], []
    for i in range(n):
        hi, wi = int(dims[i, 0, 0]), int(dims[i, 0, 1])
        ho, wo = int(dims[i, 1, 0]), int(dims[i, 1, 1])
        pair = (grids[i, 0].reshape(30, 30)[:hi, :wi].copy(),
                grids[i, 1].reshape(30, 30)[:ho, :wo].copy())
        (train if splits[i] == 0 else test).append(pair)
    return train, test


__all__ = ["available", "bake_task_native"]
