"""Native (C++) helper library loader.

Builds native/*.cpp into a shared library on demand (g++ -O2) and binds it
via ctypes — the framework's equivalent of the reference's prebuilt XUSG
DLLs, except source-distributed and auto-built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librtggx_native.so")

_lib = None


def _build() -> None:
    srcs = [os.path.join(_NATIVE_DIR, f)
            for f in sorted(os.listdir(_NATIVE_DIR)) if f.endswith(".cpp")]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH] + srcs
    subprocess.run(cmd, check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    srcs = [os.path.join(_NATIVE_DIR, f)
            for f in os.listdir(_NATIVE_DIR) if f.endswith(".cpp")]
    stale = (not os.path.exists(_LIB_PATH)
             or any(os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
                    for s in srcs))
    if stale:
        _build()
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.bc6h_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p]
    _lib.bc6h_decode.restype = None
    return _lib


def bc6h_decode(blocks: np.ndarray, is_signed: bool = False) -> np.ndarray:
    """blocks: (N, 16) uint8 BC6H blocks -> (N, 16, 3) float32 texels
    (each block is a 4x4 tile, texels raster order)."""
    lib = get_lib()
    blocks = np.ascontiguousarray(blocks, np.uint8).reshape(-1, 16)
    n = blocks.shape[0]
    out = np.empty((n, 16, 3), np.uint16)
    lib.bc6h_decode(blocks.ctypes.data, n, int(is_signed), out.ctypes.data)
    return out.view(np.float16).astype(np.float32)
