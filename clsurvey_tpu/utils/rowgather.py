"""ctypes bindings for the native threaded row-gather
(native/rowgather.cpp) used by the chunked-streaming data path.

Auto-builds with `make -C native` on first use (same contract as
ops/qp_native.py). `gather_rows` transparently falls back to numpy fancy
indexing when the library is unavailable or the source layout doesn't
qualify, so callers never need to branch.

This plays the role of the reference's multi-worker DataLoader collate
(ref:src/methods/rehearsal/main_rehearsal.py:181-184 num_workers=4): the
host-side copy that assembles a shuffled chunk is parallelised instead
of riding numpy's single-threaded take."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclsurvey_rowgather.so")

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.rowgather_u8.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                 i64p, ctypes.c_int64, u8p, ctypes.c_int]
    lib.rowgather_u8.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def default_threads() -> int:
    return min(8, os.cpu_count() or 1)


def gather_rows(src: np.ndarray, idx: np.ndarray,
                n_threads: int | None = None) -> np.ndarray:
    """dst[i] = src[idx[i]] along axis 0, C-contiguous output.

    Uses the native threaded gather when `src` is a C-contiguous uint8
    array; otherwise (or when the library is unavailable) falls back to
    `np.ascontiguousarray(src[idx])`."""
    lib = _load()
    idx = np.asarray(idx)
    if (lib is None or src.dtype != np.uint8 or idx.ndim != 1
            or not src.flags["C_CONTIGUOUS"] or src.ndim < 1):
        # numpy fancy indexing covers every layout/shape the fast path
        # doesn't (non-uint8, non-contiguous, multi-dim idx)
        return np.ascontiguousarray(src[idx])
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n_idx = int(idx.shape[0])
    row_bytes = int(src.nbytes // src.shape[0]) if src.shape[0] else 0
    if n_idx == 0 or row_bytes == 0:
        return np.ascontiguousarray(src[idx])
    dst = np.empty((n_idx,) + src.shape[1:], np.uint8)
    rc = lib.rowgather_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], row_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_idx,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_threads if n_threads is not None else default_threads()))
    if rc != 0:
        raise IndexError("rowgather: index out of range")
    return dst
