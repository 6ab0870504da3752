"""AsyncDumpWriter: .npy serialization through the native writer pool.

Builds numpy-format headers in Python (tiny) and hands (header, payload)
buffers to the C++ pool (dumpio.cpp), so device-to-disk feature dumping
overlaps with the next batch's TPU compute.  Falls back to synchronous
np.save when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

from .build import load_library

_lib = None
_lib_lock = threading.Lock()


def _get_lib():
    global _lib
    with _lib_lock:
        if _lib is None:
            lib = load_library('dumpio')
            if lib is not None:
                lib.dw_create.restype = ctypes.c_void_p
                lib.dw_create.argtypes = [ctypes.c_int]
                lib.dw_submit.restype = ctypes.c_int
                lib.dw_submit.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p,
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_int64]
                lib.dw_pending.restype = ctypes.c_int
                lib.dw_pending.argtypes = [ctypes.c_void_p]
                lib.dw_flush.restype = ctypes.c_int
                lib.dw_flush.argtypes = [ctypes.c_void_p]
                lib.dw_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib if lib is not None else False
    return _lib or None


def native_available() -> bool:
    return _get_lib() is not None


def npy_header(arr: np.ndarray) -> bytes:
    """numpy .npy v1.0 header for a C-contiguous array."""
    descr = np.lib.format.dtype_to_descr(arr.dtype)
    d = {'descr': descr, 'fortran_order': False, 'shape': arr.shape}
    header = repr(d).encode('latin1') + b'\n'
    # pad so that magic(6)+ver(2)+hlen(2)+header is a multiple of 64
    pad = 64 - ((10 + len(header)) % 64)
    header = header[:-1] + b' ' * pad + b'\n'
    return (b'\x93NUMPY\x01\x00'
            + len(header).to_bytes(2, 'little') + header)


class AsyncDumpWriter:
    """submit(path, array) enqueues; flush() blocks until everything is on
    disk and raises on write errors."""

    def __init__(self, n_threads: int = 4):
        self._lib = _get_lib()
        self._pool = None
        if self._lib is not None:
            self._pool = ctypes.c_void_p(self._lib.dw_create(n_threads))

    @property
    def is_native(self) -> bool:
        return self._pool is not None

    def submit(self, path: str, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        if self._pool is None:
            os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
            np.save(path[:-4] if path.endswith('.npy') else path, arr)
            return
        header = npy_header(arr)
        rc = self._lib.dw_submit(
            self._pool, path.encode(), header, len(header),
            arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
        if rc != 0:
            raise IOError(f'dw_submit failed for {path}')

    def pending(self) -> int:
        return 0 if self._pool is None else self._lib.dw_pending(self._pool)

    def flush(self):
        if self._pool is None:
            return
        errors = self._lib.dw_flush(self._pool)
        if errors:
            raise IOError(f'{errors} feature dump(s) failed to write')

    def close(self):
        if self._pool is not None:
            self.flush()
            self._lib.dw_destroy(self._pool)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
