"""Native (C) runtime components, built on demand with the system compiler
and loaded via ctypes (pybind11 is not in this image; ctypes avoids any
build-time dependency).  Falls back gracefully: every consumer treats a
``None`` export as "use the pure-numpy path"."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


class _CIndexResult(ctypes.Structure):
    _fields_ = [
        ("numerator", ctypes.c_double),
        ("denominator", ctypes.c_double),
        ("concordant", ctypes.c_longlong),
        ("discordant", ctypes.c_longlong),
        ("tied_risk", ctypes.c_longlong),
        ("tied_time", ctypes.c_longlong),
    ]


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = osp.join(_HERE, "cindex.c")
    cache_dir = os.environ.get("IMP_TPU_NATIVE_CACHE", tempfile.gettempdir())
    lib_path = osp.join(cache_dir, "imp_tpu_cindex.so")
    try:
        if not osp.exists(lib_path) or osp.getmtime(lib_path) < osp.getmtime(src):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", src, "-o", lib_path, "-lm"],
                        check=True,
                        capture_output=True,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(lib_path)
        lib.weighted_concordance.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
            ctypes.c_double,
            ctypes.POINTER(_CIndexResult),
        ]
        lib.weighted_concordance.restype = None
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def native_weighted_concordance(event, time_arr, estimate, weights, tied_tol=1e-8):
    """C-accelerated weighted concordance; returns None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    event = np.ascontiguousarray(np.asarray(event, dtype=np.uint8))
    time_arr = np.ascontiguousarray(np.asarray(time_arr, dtype=np.float64))
    estimate = np.ascontiguousarray(np.asarray(estimate, dtype=np.float64))
    weights = np.ascontiguousarray(np.asarray(weights, dtype=np.float64))
    n = len(time_arr)
    res = _CIndexResult()
    lib.weighted_concordance(
        event.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        time_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        estimate.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(n),
        ctypes.c_double(tied_tol),
        ctypes.byref(res),
    )
    if res.denominator == 0.0:
        from ..evaluation.survival_metrics import NoComparablePairError

        raise NoComparablePairError("Data has no comparable pairs.")
    return (
        res.numerator / res.denominator,
        int(res.concordant),
        int(res.discordant),
        int(res.tied_risk),
        int(res.tied_time),
    )
