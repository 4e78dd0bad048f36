"""ctypes wrapper for the native page-copy library, with lazy on-demand build.

Replaces numpy fancy-indexing for host-side KV page scatter/gather during
swap: run-coalesced memcpy, OpenMP-parallel over layers (the TPU-native
equivalent of the reference's run-coalesced cudaMemcpyAsync loop,
csrc/src/block_swapping.cpp:36-84). Falls back to numpy transparently when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "page_copy.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libpagecopy.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        try:  # retry without OpenMP
            subprocess.run([c for c in cmd if c != "-fopenmp"],
                           check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            return False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (os.path.getmtime(_LIB_PATH)
                                             < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.copy_pages.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.copy_pages.restype = None
        _lib = lib
    return _lib


def is_available() -> bool:
    return _get_lib() is not None


def copy_pages(dst: np.ndarray, src: np.ndarray,
               dst_pages: np.ndarray, src_pages: np.ndarray,
               page_bytes: int):
    """Copy pages between two [L, n_slots, ...] C-contiguous host buffers.

    dst/src: same dtype; a page is `page_bytes` contiguous bytes within a
    layer. dst_pages/src_pages: i32 page indices (equal length).
    """
    assert dst.flags.c_contiguous and src.flags.c_contiguous
    assert dst.dtype == src.dtype
    n_layers = dst.shape[0]
    assert src.shape[0] == n_layers
    dst_pages = np.ascontiguousarray(dst_pages, np.int32)
    src_pages = np.ascontiguousarray(src_pages, np.int32)
    n = len(dst_pages)
    assert len(src_pages) == n
    if n == 0:
        return

    lib = _get_lib()
    if lib is None:  # numpy fallback
        ps = page_bytes // (dst.strides[1])  # slots per page
        d = dst.reshape(n_layers, -1)
        s = src.reshape(n_layers, -1)
        row = dst.strides[1] // dst.itemsize
        for dp, sp in zip(dst_pages, src_pages):
            d[:, dp * ps * row:(dp + 1) * ps * row] = \
                s[:, sp * ps * row:(sp + 1) * ps * row]
        return

    lib.copy_pages(
        dst.ctypes.data_as(ctypes.c_char_p),
        src.ctypes.data_as(ctypes.c_char_p),
        dst_pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        src_pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, page_bytes,
        dst.strides[0], src.strides[0], n_layers)
