"""ctypes binding to the native I/O helpers (librspc_native.so).

Builds on demand via ``make -C native`` the first time it is imported (the
toolchain is assumed present on dev hosts); every entry point degrades to
the pure-Python implementation if the library is missing or the build
fails, so the package never hard-depends on a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librspc_native.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        makefile = os.path.join(_NATIVE_DIR, "Makefile")
        if os.path.exists(makefile):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.rspc_lzf_compress.restype = ctypes.c_uint64
    lib.rspc_lzf_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.rspc_lzf_decompress.restype = ctypes.c_uint64
    lib.rspc_lzf_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.rspc_kdtree_build.restype = ctypes.c_void_p
    lib.rspc_kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.rspc_kdtree_nn.restype = None
    lib.rspc_kdtree_nn.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.rspc_kdtree_free.restype = None
    lib.rspc_kdtree_free.argtypes = [ctypes.c_void_p]
    lib.rspc_load_dataset.restype = ctypes.c_int64
    lib.rspc_load_dataset.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def lzf_compress(data: bytes) -> Optional[bytes]:
    lib = _load()
    if lib is None or not data:
        return None
    cap = len(data) + len(data) // 16 + 96
    out = ctypes.create_string_buffer(cap)
    n = lib.rspc_lzf_compress(data, len(data), out, cap)
    if n == 0:
        return None
    return out.raw[:n]


def lzf_decompress(data: bytes, expected: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(expected)
    n = lib.rspc_lzf_decompress(data, len(data), out, expected)
    if n != expected:
        return None
    return out.raw


class KDTree:
    """CPU kd-tree oracle (native; raises if the library is unavailable).

    Plays the role of pcl::KdTreeFLANN for golden-data generation and
    TPU-kernel validation — not on the TPU compute path."""

    def __init__(self, xyz: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._xyz = np.ascontiguousarray(xyz, np.float32)
        self._handle = lib.rspc_kdtree_build(
            self._xyz.ctypes.data_as(ctypes.c_void_p), self._xyz.shape[0]
        )

    def query(self, queries: np.ndarray):
        q = np.ascontiguousarray(queries, np.float32)
        m = q.shape[0]
        idx = np.empty(m, np.int32)
        d2 = np.empty(m, np.float32)
        self._lib.rspc_kdtree_nn(
            self._handle,
            q.ctypes.data_as(ctypes.c_void_p),
            m,
            idx.ctypes.data_as(ctypes.c_void_p),
            d2.ctypes.data_as(ctypes.c_void_p),
        )
        return d2, idx

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.rspc_kdtree_free(self._handle)
            self._handle = None


def load_dataset(paths, capacity: int):
    """Threaded native load of PCD files with the standard x/y/z/rgb
    float layout into padded [n, capacity] host arrays.

    Returns ``(xyz f32[n,cap,3], rgb f32[n,cap,3], valid bool[n,cap],
    counts i64[n])`` or None when the native library is unavailable.
    ``counts[i] == -1`` marks a file the fast path could not parse — the
    caller loads that one through the general Python reader."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    xyz = np.empty((n, capacity, 3), np.float32)
    rgb = np.empty((n, capacity, 3), np.float32)
    valid = np.zeros((n, capacity), np.uint8)
    counts = np.zeros((n,), np.int64)
    arr = (ctypes.c_char_p * n)(
        *[os.fsencode(os.fspath(p)) for p in paths]
    )
    lib.rspc_load_dataset(
        arr, n, capacity,
        xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        valid.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    return xyz, rgb, valid.astype(bool), counts
