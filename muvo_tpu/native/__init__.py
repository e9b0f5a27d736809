"""Native host data-path kernels (C++, ctypes-bound) with numpy fallback.

Builds range_view.cpp into a shared library on first use (g++ -O3, cached
next to the source). The input pipeline uses these for the per-frame hot
loops; everything degrades gracefully to the numpy implementations when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "range_view.cpp")
_LIB_PATH = os.path.join(_HERE, "_muvo_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o",
           _LIB_PATH, _SRC]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120)
        return result.returncode == 0
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")

        lib.range_project.argtypes = [
            f32p, u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, f32p, f32p, f32p, u8p,
        ]
        lib.densify_voxels.argtypes = [
            u16p, u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p,
        ]
        lib.decode_depth.argtypes = [u8p, ctypes.c_int64, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def range_project(points: np.ndarray, sems: np.ndarray, h: int, w: int,
                  fov_down_rad: float, fov_up_rad: float,
                  lidar_pos) -> Optional[Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]]:
    """Returns (depth (h,w) f32, xyz (h,w,3) f32, sem (h,w) u8) or None."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    sem = np.ascontiguousarray(sems, np.uint8)
    depth = np.empty((h, w), np.float32)
    xyz = np.empty((h, w, 3), np.float32)
    out_sem = np.empty((h, w), np.uint8)
    pos = np.ascontiguousarray(np.asarray(lidar_pos, np.float32))
    lib.range_project(pts, sem, pts.shape[0], h, w,
                      np.float32(fov_down_rad), np.float32(fov_up_rad),
                      pos, depth, xyz, out_sem)
    return depth, xyz, out_sem


def densify_voxels(coords: np.ndarray, sems: np.ndarray,
                   grid_size) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(coords, np.uint16)
    s = np.ascontiguousarray(sems, np.uint8)
    x, y, z = (int(v) for v in grid_size)
    grid = np.empty((x, y, z), np.uint8)
    lib.densify_voxels(c, s, c.shape[0], x, y, z, grid)
    return grid


def decode_depth(rgb: np.ndarray) -> Optional[np.ndarray]:
    """(..., 3) uint8 RGB -> metres (float32)."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(rgb.reshape(-1, 3), np.uint8)
    out = np.empty(flat.shape[0], np.float32)
    lib.decode_depth(flat, flat.shape[0], out)
    return out.reshape(rgb.shape[:-1])
