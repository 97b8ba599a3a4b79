"""ctypes bindings for the native IO/RNG support library (native/*.cpp).

The library is built lazily with g++ the first time it is needed and cached
next to the source. Every entry point has a pure-Python fallback, so the
framework works without a toolchain (just slower for large trajectory dumps
and without bit-exact reference RNG parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "quandary_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libquandary_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        c_dp = ctypes.POINTER(ctypes.c_double)
        lib.qtpu_write_state_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, c_dp, c_dp,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.qtpu_write_state_rows.restype = ctypes.c_int
        lib.qtpu_write_obs_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, c_dp, c_dp,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p]
        lib.qtpu_write_obs_rows.restype = ctypes.c_int
        lib.qtpu_mt19937_uniform.argtypes = [ctypes.c_uint32, ctypes.c_int64, c_dp]
        lib.qtpu_mt19937_uniform.restype = None
        lib.qtpu_read_table.argtypes = [ctypes.c_char_p, c_dp, ctypes.c_int64]
        lib.qtpu_read_table.restype = ctypes.c_int64
        lib.qtpu_read_triplets.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), c_dp, ctypes.c_int64]
        lib.qtpu_read_triplets.restype = ctypes.c_int64
        _LIB = lib
        return _LIB


def mt19937_uniform(seed: int, n: int) -> Optional[np.ndarray]:
    """n uniform [0,1) doubles from std::mt19937(seed) — bit-exact with the
    reference's random control init on Linux. None if the native lib is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.float64)
    lib.qtpu_mt19937_uniform(
        ctypes.c_uint32(seed), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def write_state_rows(path: str, header: str, times: np.ndarray,
                     data: np.ndarray, decim: int = 1) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    times = np.ascontiguousarray(times, dtype=np.float64)
    data = np.ascontiguousarray(data, dtype=np.float64)
    nrows, ncols = data.shape
    rc = lib.qtpu_write_state_rows(
        path.encode(), header.encode(),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nrows, ncols, decim)
    return rc == 0


def read_triplets(path: str, ncols_id: int,
                  maxn: int = 1 << 22) -> Optional[tuple]:
    """Sparse-triplet Hamiltonian file -> (ids (n, ncols_id) int64,
    vals (n,) complex128), or None if the native lib is unavailable.
    ncols_id = 2 for 'row col re im' (Hsys), 3 for 'osc row col re im'
    (Hc). ~40x the Python line parser on large custom Hamiltonians.
    The capacity grows until the whole file fits (the C reader stops at
    maxn, and a full buffer is indistinguishable from an exact fit —
    silent truncation would corrupt the Hamiltonian)."""
    lib = get_lib()
    if lib is None:
        return None
    # size the first buffer from the file itself (a triplet line is at
    # least ~8 bytes) instead of always allocating the 4M-entry maximum
    try:
        maxn = min(maxn, max(64, os.path.getsize(path) // 8 + 1))
    except OSError:
        return None
    while True:
        ids = np.empty((maxn, ncols_id), dtype=np.int64)
        vals = np.empty((maxn, 2), dtype=np.float64)
        n = lib.qtpu_read_triplets(
            path.encode(), ncols_id,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), maxn)
        if n < 0:
            return None
        if n < maxn:
            return ids[:n].copy(), (vals[:n, 0] + 1j * vals[:n, 1])
        maxn *= 2


def read_table(path: str, maxn: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(maxn, dtype=np.float64)
    n = lib.qtpu_read_table(path.encode(),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                            maxn)
    if n < 0:
        return None
    return out[:n]
