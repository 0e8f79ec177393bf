"""ctypes bindings for the native (C++) data-path core.

Loads `native/libpreworld_native.so` (build with `make -C native`); every
entry point has a numpy fallback so the framework runs without the build
step. See native/ray_builder.cpp for the op semantics.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libpreworld_native.so",
)

_lib = None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.build_ray_records.argtypes = [f32p] * 6 + [ctypes.c_int64, f32p]
        lib.wrs_topk.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, i64p,
        ]
        lib.zbuffer_depth_map.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, f32p,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_ray_records(coor, depth, seg, rgb, c2w, K) -> np.ndarray:
    """(n,16) ray records; native when built, else the numpy path."""
    lib = get_lib()
    n = coor.shape[0]
    if lib is None:
        from ..geometry.rays import pts2ray

        return pts2ray(coor, depth, seg, rgb, c2w, K)
    coor = np.ascontiguousarray(coor, np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    seg = np.ascontiguousarray(seg, np.float32)
    rgb = np.ascontiguousarray(rgb, np.float32)
    c2w = np.ascontiguousarray(c2w, np.float32)
    K = np.ascontiguousarray(K, np.float32)
    out = np.empty((n, 16), np.float32)
    lib.build_ray_records(
        _fp(coor), _fp(depth), _fp(seg), _fp(rgb), _fp(c2w), _fp(K),
        ctypes.c_int64(n), _fp(out),
    )
    return out


def wrs_topk(weights: np.ndarray, k: int, seed: int) -> np.ndarray:
    lib = get_lib()
    n = weights.shape[0]
    if lib is None:
        rng = np.random.default_rng(seed)
        keys = rng.exponential(size=n) / np.maximum(weights, 1e-12)
        if k < n:
            return np.argpartition(keys, k - 1)[:k]
        return np.arange(n)
    weights = np.ascontiguousarray(weights, np.float32)
    out = np.empty(min(k, n), np.int64)
    lib.wrs_topk(
        _fp(weights), ctypes.c_int64(n), ctypes.c_int64(k),
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def zbuffer_depth_map(pts_uvz, height, width, d_lo, d_hi) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from .pipeline import points_to_depth_map

        return points_to_depth_map(pts_uvz, height, width, (d_lo, d_hi))
    pts = np.ascontiguousarray(pts_uvz, np.float32)
    out = np.empty((height, width), np.float32)
    lib.zbuffer_depth_map(
        _fp(pts), ctypes.c_int64(pts.shape[0]), ctypes.c_int64(height),
        ctypes.c_int64(width), ctypes.c_float(d_lo), ctypes.c_float(d_hi),
        _fp(out),
    )
    return out
