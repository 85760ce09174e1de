"""Native (C++) host components, compiled on demand with g++.

`build_transport_native(static, arr, supersample)` is a drop-in for
ops/transport2d.build_transport on analytic-vial scenes: the 2D
refracted ray fan and its rasterization run as OpenMP C++ on the host
(per-angle parallel, no atomics) instead of a jitted device program —
this is per-scene geometry preprocessing, the stack position Mitsuba's
C++ scene build / BVH construction occupies in the reference. Returns
None when the shared library is unavailable (no compiler) so callers
can fall back to the JAX path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "transport2d.cpp")
_LIB = os.path.join(_HERE, "libtransport2d.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile():
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # without OpenMP (single-threaded fallback)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC,
                            "-o", _LIB], check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            return False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _compile():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.rasterize_fan.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            i32p, i32p, i32p, f32p, f32p, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p, f32p,
        ]
        lib.rasterize_fan.restype = None
        lib.transport2d_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def available():
    return _load() is not None


def build_transport_native(static, arr, supersample=1):
    """Host-native equivalent of transport2d.build_transport.

    Returns numpy (W, UW) of shape (A, Y, X), or None if the native
    library can't be built/loaded or a surface kind is unsupported.
    """
    from ..models.geometry import CYLINDER, BOX
    lib = _load()
    if lib is None:
        return None
    if any(s.kind not in (CYLINDER, BOX) for s in static.surfaces):
        return None

    p = static.projector
    A, U, S = p.n_patterns, p.resx, int(supersample)
    X, Y, _ = static.sensor.res

    kind = np.asarray([s.kind for s in static.surfaces], np.int32)
    bsdf = np.asarray([s.bsdf for s in static.surfaces], np.int32)
    ms = np.asarray([s.medium_side for s in static.surfaces], np.int32)
    eta = np.ascontiguousarray(np.asarray(arr["surf_eta"], np.float32))
    params = np.ascontiguousarray(
        np.asarray(arr["surf_params"], np.float32))
    bmin = np.asarray(arr["bbox_min"], np.float32)
    bmax = np.asarray(arr["bbox_max"], np.float32)

    W = np.zeros((A, Y, X), np.float32)
    UW = np.zeros((A, Y, X), np.float32)
    lib.rasterize_fan(
        A, U, S, X, Y,
        kind, bsdf, ms, eta, params, len(static.surfaces),
        float(np.asarray(arr["pixel_size"])[0]),
        float(np.asarray(arr["motion_distance"])),
        1 if static.clockwise else 0,
        float(np.asarray(arr["sigma_t"])),
        float(np.asarray(arr["albedo"])),
        float(bmin[0]), float(bmin[1]), float(bmax[0]), float(bmax[1]),
        W, UW)
    return W, UW
