"""ctypes bindings for the native host core (libpbcore.so).

The library is built on demand with `make` the first time it is needed and
cached next to the source. Set PBTPU_DISABLE_NATIVE=1 to force the pure
numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..align.types import AlignResult
from ..config import Constants

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libpbcore.so")
_SRC_PATH = os.path.join(_HERE, "pbcore.cpp")
_build_lock = threading.Lock()
_lib_cache: Optional[ctypes.CDLL] = None


def _ensure_built() -> bool:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC_PATH
    ):
        return True
    with _build_lock:
        if os.path.exists(_LIB_PATH) and os.path.getmtime(
            _LIB_PATH
        ) >= os.path.getmtime(_SRC_PATH):
            return True
        try:
            subprocess.run(
                ["make", "-C", _HERE, "libpbcore.so"],
                check=True,
                capture_output=True,
            )
            return True
        except Exception:
            return False


def load(optional: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library."""
    global _lib_cache
    if _lib_cache is not None:
        return _lib_cache
    if not _ensure_built():
        if optional:
            return None
        raise RuntimeError("failed to build libpbcore.so")
    lib = ctypes.CDLL(_LIB_PATH)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.pb_align.restype = ctypes.c_int
    lib.pb_align.argtypes = [
        u8p, ctypes.c_int, u8p, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_int,
        i32p, u8p, u8p, ctypes.c_int64,
    ]
    lib.pb_align_quirk.restype = ctypes.c_int
    lib.pb_align_quirk.argtypes = lib.pb_align.argtypes
    # reference scalar row loop, exported for SIMD differential fuzzing
    lib.pb_align_scalar.restype = ctypes.c_int
    lib.pb_align_scalar.argtypes = lib.pb_align.argtypes
    lib.pb_quirk_reset.restype = None
    lib.pb_quirk_reset.argtypes = []
    lib.pb_scan_records.restype = ctypes.c_int64
    lib.pb_scan_records.argtypes = [u8p, ctypes.c_int64, i64p, i64p, ctypes.c_int64]
    lib.pb_pack.restype = None
    lib.pb_pack.argtypes = [u8p, ctypes.c_int64, u8p]
    lib.pb_unpack.restype = None
    lib.pb_unpack.argtypes = [u8p, ctypes.c_int64, u8p]

    _lib_cache = lib
    return lib


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def quirk_reset(lib: ctypes.CDLL) -> None:
    """Zero the persistent quirk DP matrix (fresh-process emulation)."""
    lib.pb_quirk_reset()


def align(
    lib: ctypes.CDLL,
    a: np.ndarray,
    b: np.ndarray,
    ratio: float = Constants.MAXR,
    maxn: int = Constants.ALIGNER_MAXN,
    maxm: int = Constants.ALIGNER_MAXM,
    quirk: bool = False,
    scalar: bool = False,
) -> Optional[AlignResult]:
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    cap = len(a) + len(b) + 2
    meta = np.zeros(5, dtype=np.int32)
    ops = np.empty(cap, dtype=np.uint8)
    vals = np.empty(cap, dtype=np.uint8)
    fn = (
        lib.pb_align_quirk
        if quirk
        else (lib.pb_align_scalar if scalar else lib.pb_align)
    )
    rc = fn(
        _u8ptr(a), len(a), _u8ptr(b), len(b),
        ctypes.c_double(ratio), maxn, maxm,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(ops), _u8ptr(vals), cap,
    )
    if rc == 0:
        return None
    if rc < 0:
        raise RuntimeError(f"pb_align failed with rc={rc}")
    nedit = int(meta[3])
    from ..align.banded import compute_band_params

    p = compute_band_params(len(a), len(b), ratio, maxn, maxm)
    return AlignResult(
        matlen_a=int(meta[0]),
        matlen_b=int(meta[1]),
        cost=int(meta[2]),
        ops=ops[:nedit].copy(),
        vals=vals[:nedit].copy(),
        len_a=p.len_a,
        len_b=p.len_b,
        max_dst=p.max_dst,
        diag_cost=int(meta[4]),
    )


def scan_records(lib: ctypes.CDLL, buf: np.ndarray):
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    n = lib.pb_scan_records(_u8ptr(buf), len(buf), None, None, 0)
    offsets = np.empty(n, dtype=np.int64)
    lengths = np.empty(n, dtype=np.int64)
    lib.pb_scan_records(
        _u8ptr(buf),
        len(buf),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
    )
    return offsets, lengths
