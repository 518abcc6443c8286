"""ctypes bindings for the native host-side data pipeline (see
habitat_native.cpp). Auto-builds with g++ on first import when missing;
callers fall back to the numpy implementations if unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhabitat_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.geodesic_field.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rasterize_triangles.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def geodesic_field_native(
    nav_occ: np.ndarray, sources: np.ndarray, res: float
) -> Optional[np.ndarray]:
    """Exact 16-connected Dijkstra (meters). None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    occ = np.ascontiguousarray(nav_occ.astype(np.uint8))
    src = np.ascontiguousarray(np.asarray(sources, np.int64).reshape(-1, 2))
    nx, nz = occ.shape
    out = np.empty((nx, nz), np.float32)
    lib.geodesic_field(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nx,
        nz,
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(src),
        ctypes.c_float(res),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def rasterize_triangles_native(
    tri_xz: np.ndarray,  # (T, 3, 2) f32
    lo: np.ndarray,  # (2,)
    res: float,
    shape,  # (nx, nz)
    tol: float,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tri_xz.astype(np.float32))
    nx, nz = shape
    mask = np.zeros((nx, nz), np.uint8)
    lib.rasterize_triangles(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(tris),
        ctypes.c_float(float(lo[0])),
        ctypes.c_float(float(lo[1])),
        ctypes.c_float(res),
        nx,
        nz,
        ctypes.c_float(tol),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)
