"""Native (C++) data-loading runtime, bound via ctypes.

Compiled on first use (g++ -O3 -shared); falls back gracefully when the
toolchain is unavailable.  See wavloader.cpp for the design rationale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wavloader.cpp")
_LIB = os.path.join(_HERE, "_wavloader.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            path = _build()
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native loader unavailable ({e}); using Python IO")
            return None
        lib = ctypes.CDLL(path)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.wav_read_mono.restype = ctypes.c_long
        lib.wav_read_mono.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_long]
        lib.wav_read_info.restype = ctypes.c_int
        lib.wav_read_info.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_long),
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


class NativeLoader:
    """Infinite [batch, seg_len] float32 stream from a file list, fed by a
    C++ thread pool (drop-in for data.datasets.Batcher over folder datasets).

    Yields (batch, fs_array) pairs when yield_fs=True (MAESTRO-style native-fs
    pipelines), else plain batches.
    """

    def __init__(self, files: list[str], seg_len: int, batch: int,
                 n_threads: int = 4, depth: int = 8, seed: int = 42,
                 yield_fs: bool = False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.batch = int(batch)
        self.seg_len = int(seg_len)
        self.yield_fs = yield_fs
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode() for f in files]
        )
        self._handle = lib.loader_create(arr, len(files), self.seg_len,
                                         self.batch, n_threads, depth, seed)
        if not self._handle:
            raise RuntimeError("loader_create failed")
        self._buf = np.empty((self.batch, self.seg_len), dtype=np.float32)
        self._fs = np.empty(self.batch, dtype=np.int32)

    def __iter__(self):
        return self

    def __next__(self):
        rc = self._lib.loader_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._fs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if rc != 0:
            raise StopIteration
        out = self._buf.copy()
        if self.yield_fs:
            return out, self._fs.copy()
        return out

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def read_wav_native(path: str):
    """Fast mono WAV read via the native parser; returns (audio, fs) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_long()
    fs = ctypes.c_int()
    ch = ctypes.c_int()
    if lib.wav_read_info(path.encode(), ctypes.byref(n), ctypes.byref(fs),
                         ctypes.byref(ch)) != 0:
        return None
    buf = np.empty(n.value, dtype=np.float32)
    got = lib.wav_read_mono(path.encode(),
                            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            n.value)
    if got < 0:
        return None
    return buf[:got], fs.value
