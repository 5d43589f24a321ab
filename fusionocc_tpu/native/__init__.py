"""ctypes bindings for the native host-preprocessing library.

Builds pointops.cpp on first use (g++ -O3 -march=native -fopenmp, cached
next to the source); every entry point has an exact numpy fallback so the
pipeline works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'pointops.cpp')
_SO = os.path.join(_HERE, 'libpointops.so')
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-fopenmp', '-std=c++17',
           _SRC, '-o', _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so:
            lib = ctypes.CDLL(so)
            c_f32p = ctypes.POINTER(ctypes.c_float)
            c_f64p = ctypes.POINTER(ctypes.c_double)
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            i64 = ctypes.c_int64
            lib.zbuffer_depth.argtypes = [c_f32p, i64, i64, i64,
                                          ctypes.c_float, ctypes.c_float,
                                          c_f32p]
            lib.transform_points.argtypes = [c_f32p, i64, i64, c_f64p, c_f32p]
            lib.range_filter_mask.argtypes = [c_f32p, i64, i64, c_f32p,
                                              c_f32p, ctypes.c_float, c_u8p]
            lib.project_points.argtypes = [c_f32p, i64, i64, c_f64p, c_f64p,
                                           c_f64p, c_f32p]
            _lib = lib
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def zbuffer_depth(uvd: np.ndarray, height: int, width: int,
                  depth_range) -> np.ndarray:
    """Min-depth z-buffer; semantics of pipeline.points_to_depthmap_np."""
    lib = get_lib()
    uvd = np.ascontiguousarray(uvd, np.float32)
    if lib is None:
        from ..data.pipeline import points_to_depthmap_np
        return points_to_depthmap_np(uvd, height, width, depth_range)
    out = np.empty((height, width), np.float32)
    lib.zbuffer_depth(_ptr(uvd, ctypes.c_float), len(uvd), height, width,
                      float(depth_range[0]), float(depth_range[1]),
                      _ptr(out, ctypes.c_float))
    return out


def transform_points(pts: np.ndarray, T: np.ndarray) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        out = pts.copy()
        out[:, :3] = (pts[:, :3].astype(np.float64) @ T[:3, :3].T
                      + T[:3, 3]).astype(np.float32)
        return out
    out = np.empty_like(pts)
    T64 = np.ascontiguousarray(T, np.float64)
    lib.transform_points(_ptr(pts, ctypes.c_float), len(pts), pts.shape[1],
                         _ptr(T64, ctypes.c_double),
                         _ptr(out, ctypes.c_float))
    return out


def range_filter_mask(pts: np.ndarray, pcr, eps: float = 1e-3) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    lo = np.asarray(pcr[:3], np.float32)
    hi = np.asarray(pcr[3:], np.float32)
    if lib is None:
        return np.all((pts[:, :3] >= lo + eps) & (pts[:, :3] <= hi - eps),
                      axis=1)
    out = np.empty(len(pts), np.uint8)
    lib.range_filter_mask(_ptr(pts, ctypes.c_float), len(pts), pts.shape[1],
                          _ptr(lo, ctypes.c_float), _ptr(hi, ctypes.c_float),
                          eps, _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def project_points(pts: np.ndarray, lidar2img: np.ndarray,
                   post_rot: np.ndarray, post_tran: np.ndarray) -> np.ndarray:
    """(P, 3) (u, v, depth) through the full lidar2img (intrinsics folded in)
    + augmentation homography."""
    lib = get_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        from ..data.pipeline import project_points_to_cam
        return project_points_to_cam(pts, lidar2img.astype(np.float32),
                                     np.eye(3, dtype=np.float32),
                                     post_rot.astype(np.float32),
                                     post_tran.astype(np.float32))
    l2c = np.ascontiguousarray(lidar2img[:3, :4], np.float64)
    pr = np.ascontiguousarray(post_rot, np.float64)
    pt = np.ascontiguousarray(post_tran, np.float64)
    out = np.empty((len(pts), 3), np.float32)
    lib.project_points(_ptr(pts, ctypes.c_float), len(pts), pts.shape[1],
                       _ptr(l2c, ctypes.c_double), _ptr(pr, ctypes.c_double),
                       _ptr(pt, ctypes.c_double), _ptr(out, ctypes.c_float))
    return out
