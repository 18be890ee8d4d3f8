"""ctypes binding for the native packed-shard loader (native/packloader.cpp).

Provides threaded batch gathers and double-buffered async prefetch out of a
memory-mapped .npy of packed uint8 images — the host-side path for datasets
larger than device HBM. Falls back to numpy when the shared library is
unavailable; builds it on demand when a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libpackloader.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.pl_open.restype = ctypes.c_void_p
    lib.pl_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                            ctypes.c_int64, ctypes.c_uint64]
    lib.pl_close.argtypes = [ctypes.c_void_p]
    lib.pl_gather.restype = ctypes.c_int
    lib.pl_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.pl_submit.restype = ctypes.c_int
    lib.pl_submit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.pl_wait.restype = ctypes.c_int64
    lib.pl_wait.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def _npy_header_bytes(path: str) -> tuple[int, tuple, np.dtype]:
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        return f.tell(), shape, dtype


class PackLoader:
    """Threaded batch gathers from a packed uint8 .npy on disk."""

    def __init__(self, npy_path: str, n_threads: int = 8,
                 reuse_buffers: bool = False):
        self.path = npy_path
        self.n_threads = n_threads
        self.reuse = reuse_buffers
        header, shape, dtype = _npy_header_bytes(npy_path)
        assert dtype == np.uint8, "packed image shards must be uint8"
        self.shape = shape
        self.row_shape = shape[1:]
        self.row_bytes = int(np.prod(shape[1:]))
        self.n = shape[0]
        self._lib = _load_lib()
        self._handle = None
        self._pending = None
        if self._lib is not None:
            self._handle = self._lib.pl_open(
                npy_path.encode(), self.row_bytes, self.n, header
            )
        if self._handle is None:
            # numpy mmap fallback
            self._mm = np.load(npy_path, mmap_mode="r")
        # Persistent output buffers: this host faults fresh pages at
        # ~13 MB/s (single-core sandbox), so allocating a new np.empty per
        # gather costs more than the disk read itself. Buffers are reused
        # ping-pong; a returned array is only valid until the next-but-one
        # call (callers immediately device_put, see train.py windowed pass).
        self._bufs: dict = {}

    def _out_buf(self, tag: str, nrows: int) -> np.ndarray:
        key = (tag, nrows)
        buf = self._bufs.get(key)
        if buf is None:
            buf = np.empty((nrows,) + tuple(self.row_shape), np.uint8)
            self._bufs[key] = buf
        return buf

    @property
    def native(self) -> bool:
        return self._handle is not None

    def gather(self, indices: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(indices.reshape(-1), np.int64)
        out = (self._out_buf("gather", len(idx)) if self.reuse
               else np.empty((len(idx),) + tuple(self.row_shape), np.uint8))
        if self._handle is not None:
            rc = self._lib.pl_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.n_threads,
            )
            if rc != 0:
                raise IndexError("pl_gather: index out of range")
            return out.reshape(tuple(indices.shape) + tuple(self.row_shape))
        out = self._mm[idx]
        return np.asarray(out).reshape(
            tuple(indices.shape) + tuple(self.row_shape)
        )

    # ---- async double-buffer API ----
    def submit(self, indices: np.ndarray) -> None:
        idx = np.ascontiguousarray(indices.reshape(-1), np.int64)
        if self._handle is not None:
            rc = self._lib.pl_submit(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx), self.n_threads,
            )
            if rc != 0:
                raise RuntimeError(f"pl_submit failed rc={rc}")
            self._pending = (tuple(indices.shape), len(idx))
        else:
            self._pending = self.gather(indices)

    def wait(self) -> np.ndarray:
        if self._handle is not None:
            shape, n = self._pending
            out = (self._out_buf("wait", n) if self.reuse
                   else np.empty((n,) + tuple(self.row_shape), np.uint8))
            got = self._lib.pl_wait(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            assert got == out.nbytes
            self._pending = None
            return out.reshape(tuple(shape) + tuple(self.row_shape))
        out, self._pending = self._pending, None
        return out

    def close(self):
        if self._handle is not None:
            self._lib.pl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
