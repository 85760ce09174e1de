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
_lock = threading.Lock()
_libs = {}

_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _compile(src, lib_path):
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o",
           lib_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # without OpenMP (single-threaded fallback)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src,
                            "-o", lib_path], check=True,
                           capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load_lib(name, setup):
    """Compile-on-demand loader; returns the ctypes lib or None."""
    with _lock:
        if name in _libs:
            return _libs[name]
        src = os.path.join(_HERE, name + ".cpp")
        lib_path = os.path.join(_HERE, "lib" + name + ".so")
        lib = None
        if not os.path.exists(lib_path) or \
                os.path.getmtime(lib_path) < os.path.getmtime(src):
            if not _compile(src, lib_path):
                _libs[name] = None
                return None
        try:
            lib = ctypes.CDLL(lib_path)
            setup(lib)
        except OSError:
            lib = None
        _libs[name] = lib
        return lib


def _setup_transport2d(lib):
    lib.rasterize_fan.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        _I32P, _I32P, _I32P, _F32P, _F32P, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        _F32P, _F32P,
    ]
    lib.rasterize_fan.restype = None
    lib.transport2d_num_threads.restype = ctypes.c_int


def _setup_mesh_accel(lib):
    lib.voxelize_mesh.argtypes = [
        _F32P, _F32P, _F32P, ctypes.c_int, _F32P, _F32P,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, _F32P,
    ]
    lib.voxelize_mesh.restype = None
    lib.mesh_column_crossings.argtypes = [
        _F32P, _F32P, _F32P, ctypes.c_int, _F32P, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, _F32P,
    ]
    lib.mesh_column_crossings.restype = None


def _load():
    return _load_lib("transport2d", _setup_transport2d)


def available():
    return _load() is not None


def mesh_accel_available():
    return _load_lib("mesh_accel", _setup_mesh_accel) is not None


def _as_f32(a):
    return np.ascontiguousarray(np.asarray(a, np.float32))


def voxelize_mesh_native(tri_bank, bbox_min, bbox_max, res, mode,
                         oversample=4):
    """XY-grid-accelerated column voxelization (libmesh_accel).

    mode 0: binary occupancy by voxel-center parity; mode 1: per-voxel
    inside fraction (oversample^2 stratified xy columns). Returns a
    numpy (Z, Y, X) float32 array, or None if the library is
    unavailable. Semantics match ops/voxelize.py.
    """
    lib = _load_lib("mesh_accel", _setup_mesh_accel)
    if lib is None:
        return None
    v0, e1, e2 = (_as_f32(tri_bank[0]), _as_f32(tri_bank[1]),
                  _as_f32(tri_bank[2]))
    X, Y, Z = res
    out = np.zeros((Z, Y, X), np.float32)
    lib.voxelize_mesh(v0, e1, e2, v0.shape[0], _as_f32(bbox_min),
                      _as_f32(bbox_max), X, Y, Z, int(mode),
                      int(oversample), out)
    return out


def mesh_column_crossings_native(tri_bank, xy, z_start, max_k=64):
    """Sorted +z crossing depths per query column, +inf padded.

    Returns numpy (n_cols, max_k), or None if unavailable.
    """
    lib = _load_lib("mesh_accel", _setup_mesh_accel)
    if lib is None:
        return None
    v0, e1, e2 = (_as_f32(tri_bank[0]), _as_f32(tri_bank[1]),
                  _as_f32(tri_bank[2]))
    xy = _as_f32(xy)
    out = np.full((xy.shape[0], max_k), np.inf, np.float32)
    lib.mesh_column_crossings(v0, e1, e2, v0.shape[0], xy, xy.shape[0],
                              np.float32(z_start), int(max_k), out)
    return out


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
