"""ctypes bindings for the native C++ data loader (native/dataloader.cpp).

The library is compiled with g++ on first use (pybind11 isn't in this image;
the C ABI + ctypes avoids any build-time Python dependency) and cached next
to the source.  Everything degrades gracefully: `native_available()` is False
if compilation fails, and callers (TTSDataset, preprocess) fall back to the
pure-numpy WAV reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "dataloader.cpp"
_LIB = _NATIVE_DIR / "libdataloader.so"

_lib = None
_lib_lock = threading.Lock()


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
            str(_SRC), "-o", str(_LIB),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.wav_decode.restype = ctypes.c_int
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dl_destroy.restype = None
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is None:
            _lib = _build() or False
    return _lib or None


def native_available() -> bool:
    return _get_lib() is not None


def decode_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode in-memory WAV bytes -> (waveform [channels, time] f32, sr)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    cap = max(len(data), 16)
    out = np.empty(cap, np.float32)
    out_len = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.wav_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(out_len), ctypes.byref(sr), ctypes.byref(ch),
    )
    if rc == -2:  # buffer too small (32-bit formats): retry exact
        out = np.empty(out_len.value, np.float32)
        rc = lib.wav_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len.value,
            ctypes.byref(out_len), ctypes.byref(sr), ctypes.byref(ch),
        )
    if rc != 0:
        raise ValueError(f"native wav decode failed (rc={rc})")
    x = out[: out_len.value].reshape(-1, ch.value).T
    return np.ascontiguousarray(x), sr.value


def load_wav_native(path) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return decode_wav_bytes(f.read())


class NativePrefetcher:
    """Background C++ decode of a list of WAV paths; iterate to get
    (index, waveform [channels, time], sr) in completion order."""

    def __init__(self, paths: List[str], n_threads: int = 4, capacity: int = 16,
                 max_samples: int = 48000 * 60 * 5):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths]
        )
        self._paths = arr  # keep alive
        self._handle = lib.dl_create(arr, len(paths), n_threads, capacity)
        self._cap = max_samples
        self._closed = False

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, int]]:
        out = np.empty(self._cap, np.float32)
        out_len = ctypes.c_int64()
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        idx = ctypes.c_int64()
        while True:
            rc = self._lib.dl_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._cap,
                ctypes.byref(out_len), ctypes.byref(sr), ctypes.byref(ch),
                ctypes.byref(idx),
            )
            if rc == 1:
                break
            if rc == -1:
                continue  # undecodable file skipped
            if rc == -2:
                self._cap = int(out_len.value)
                out = np.empty(self._cap, np.float32)
                continue
            wav = (
                out[: out_len.value].reshape(-1, ch.value).T.copy()
            )
            yield int(idx.value), wav, int(sr.value)

    def close(self):
        if not self._closed:
            self._lib.dl_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
