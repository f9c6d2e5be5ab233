"""Native C++ host components, loaded via ctypes (no pybind11 in the
image; ref: the reference's C++ host core).

The shared library is compiled on first use with g++ -O3 and cached next
to the sources; a NumPy fallback exists for every native path so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from raytracingproject_tpu.utils import log

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_LOCK = threading.Lock()
_FAILED = False


def _compile_lib():
    src = os.path.join(_HERE, "bvh_builder.cpp")
    out = os.path.join(_HERE, "librtp_native.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           "-pthread", src, "-o", out + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(out + ".tmp", out)
    return out


def get_lib():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            path = _compile_lib()
            lib = ctypes.CDLL(path)
            lib.rtp_build_bvh.restype = ctypes.c_int
            lib.rtp_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ]
            lib.rtp_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except Exception as e:  # pragma: no cover - toolchain missing
            log.log_warning("native lib unavailable (%s); using NumPy "
                            "fallbacks", e)
            _FAILED = True
    return _LIB


def build_bvh_native(lo, hi, max_leaf_size=4):
    """C++ SAH build; returns (bounds, children, prim_order) or None."""
    lib = get_lib()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = len(lo)
    out_bounds = ctypes.POINTER(ctypes.c_float)()
    out_children = ctypes.POINTER(ctypes.c_int32)()
    out_nnodes = ctypes.c_int32()
    out_order = ctypes.POINTER(ctypes.c_int32)()
    rc = lib.rtp_build_bvh(
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, max_leaf_size,
        ctypes.byref(out_bounds), ctypes.byref(out_children),
        ctypes.byref(out_nnodes), ctypes.byref(out_order))
    if rc != 0:
        return None
    nn = out_nnodes.value
    bounds = np.ctypeslib.as_array(out_bounds, (nn, 12)).copy()
    children = np.ctypeslib.as_array(out_children, (nn, 2)).copy()
    order = np.ctypeslib.as_array(out_order, (max(n, 1),))[:n].copy()
    lib.rtp_free(out_bounds)
    lib.rtp_free(out_children)
    lib.rtp_free(out_order)
    return bounds, children, order
