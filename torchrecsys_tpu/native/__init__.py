"""ctypes bindings for the native ingest kernels (ingest.cpp).

Built on demand with g++ (no pybind11 in this environment; plain C ABI +
ctypes keeps the binding layer trivial). Every entry point has a pure-Python
fallback in the callers, so the package works without a compiler; the native
path is a ~20-100x host-side speedup for string-id encoding and metadata
parsing at production scale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ingest.cpp")
_SO = os.path.join(_DIR, "_ingest.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True

        def bind() -> Optional[ctypes.CDLL]:
            try:
                lib = ctypes.CDLL(_SO)
                i64, i32p, i64p = (
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int64),
                )
                for name in ("trs_encode_u32", "trs_encode_bytes"):
                    fn = getattr(lib, name)
                    fn.restype = i64
                    fn.argtypes = [ctypes.c_void_p, i64, i64, i32p, i64p]
                for name in ("trs_parse_int_lists_u32", "trs_parse_int_lists_bytes"):
                    fn = getattr(lib, name)
                    fn.restype = i64
                    fn.argtypes = [ctypes.c_void_p, i64, i64, i32p, i64, i64p]
                fn = lib.trs_alias_build
                fn.restype = i64
                fn.argtypes = [
                    ctypes.POINTER(ctypes.c_double),
                    i64,
                    ctypes.POINTER(ctypes.c_float),
                    i32p,
                ]
                return lib
            except (OSError, AttributeError):
                # AttributeError = a stale .so missing a newer symbol (mtime
                # comparison can be fooled by restored caches/clock skew)
                return None

        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        _lib = bind()
        if _lib is None and _build():  # stale binary: rebuild once and retry
            _lib = bind()
        return _lib


def available() -> bool:
    return _load() is not None


def encode_strings(arr: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Encode a numpy 'U' or 'S' column -> (codes int32, first-occurrence
    indices int64 of each vocab entry). None if native path unavailable or
    dtype unsupported."""
    lib = _load()
    if lib is None or arr.ndim != 1:
        return None
    if arr.dtype.kind == "U":
        fn = lib.trs_encode_u32
    elif arr.dtype.kind == "S":
        fn = lib.trs_encode_bytes
    else:
        return None
    arr = np.ascontiguousarray(arr)
    n = arr.shape[0]
    codes = np.empty(n, np.int32)
    first = np.empty(max(n, 1), np.int64)
    vocab = fn(
        arr.ctypes.data_as(ctypes.c_void_p),
        n,
        arr.dtype.itemsize,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return codes, first[:vocab]


def alias_build(scaled: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Walker/Vose alias table from a mean-1-scaled distribution (f64 (N,))
    -> (prob f32 (N,), alias int32 (N,)). None if native unavailable."""
    lib = _load()
    if lib is None or scaled.ndim != 1:
        return None
    scaled = np.ascontiguousarray(scaled, np.float64)
    n = scaled.shape[0]
    prob = np.empty(n, np.float32)
    alias = np.empty(n, np.int32)
    lib.trs_alias_build(
        scaled.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return prob, alias


def parse_int_lists(arr: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parse a numpy 'U'/'S' column of "[3, 7]"-style cells -> (flat int32
    values, int64 offsets of length n+1). None if unavailable, unsupported,
    or any cell contains non-numeric content (caller falls back)."""
    lib = _load()
    if lib is None or arr.ndim != 1:
        return None
    if arr.dtype.kind == "U":
        fn = lib.trs_parse_int_lists_u32
    elif arr.dtype.kind == "S":
        fn = lib.trs_parse_int_lists_bytes
    else:
        return None
    arr = np.ascontiguousarray(arr)
    n = arr.shape[0]
    offsets = np.empty(n + 1, np.int64)
    # generous initial capacity: ~width/2 ints per cell
    cap = max(16, n * max(arr.dtype.itemsize // 8, 2))
    while True:
        values = np.empty(cap, np.int32)
        total = fn(
            arr.ctypes.data_as(ctypes.c_void_p),
            n,
            arr.dtype.itemsize,
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if total == np.iinfo(np.int64).min:  # capacity exhausted
            cap *= 4
            continue
        if total < 0:  # malformed cell -> Python fallback
            return None
        return values[:total], offsets
