"""ctypes bindings for the native IO kernels (bed_reader.cpp).

The shared library is compiled lazily on first use with g++ -O3 and cached
next to the source; absence of a toolchain degrades to the NumPy fallbacks in
:mod:`pygemma_tpu.io.plink`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bed_reader.cpp")
_LIB = os.path.join(_HERE, "libpygemma_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB,
             _SRC, "-lpthread"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.pygemma_decode_bed.restype = ctypes.c_int
        lib.pygemma_decode_bed.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.pygemma_read_filtered_matrix.restype = ctypes.c_int
        lib.pygemma_read_filtered_matrix.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_bed(path: str, n: int, bytes_per_snp: int, snp_idx: np.ndarray,
               count_a1: bool, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    snp_idx = np.ascontiguousarray(snp_idx, dtype=np.int64)
    out = np.empty((n, len(snp_idx)), dtype=np.float32)
    rc = lib.pygemma_decode_bed(
        path.encode(), n, bytes_per_snp,
        snp_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(snp_idx), int(count_a1), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native bed decode failed (rc={rc}) for {path}")
    return out


def read_filtered_matrix(path: str, indices: np.ndarray) -> np.ndarray:
    """Stream an ASCII matrix keeping only sampled rows/cols (sorted indices).

    Native replacement for the reference's Rcpp matrix_reader
    (experiments/benchmarks/matrix_reader.cpp) with a NumPy fallback.
    """
    indices = np.ascontiguousarray(np.sort(np.asarray(indices)), dtype=np.int64)
    k = len(indices)
    lib = _load()
    if lib is None:  # pure-python fallback: still line-streamed
        out = np.empty((k, k), dtype=np.float32)
        want = {int(r): i for i, r in enumerate(indices)}
        cols = indices
        with open(path) as f:
            for row, line in enumerate(f):
                if row in want:
                    vals = np.array(line.split(), dtype=np.float32)
                    out[want[row]] = vals[cols]
        return out
    out = np.empty((k, k), dtype=np.float32)
    rc = lib.pygemma_read_filtered_matrix(
        path.encode(),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native filtered matrix read failed (rc={rc}) for {path}")
    return out
