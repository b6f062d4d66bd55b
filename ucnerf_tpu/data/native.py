"""ctypes bindings for the native C++ data path (``native/colmap_fast.cpp``).

Drop-in accelerated version of ``load_colmap_sparse_depth`` with a pure-
Python fallback when the shared library hasn't been built
(``make -C native``).  Matches the reference splat semantics
(``data/scared.py:287-344``) bit-for-bit on the float32 outputs.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.environ.get("UCNERF_COLMAP_FAST", ""),
                 os.path.join(here, "native", "libcolmap_fast.so")):
        if cand and os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.colmap_fast_load.restype = ctypes.c_void_p
            lib.colmap_fast_load.argtypes = [ctypes.c_char_p]
            lib.colmap_fast_free.argtypes = [ctypes.c_void_p]
            lib.colmap_fast_num_images.restype = ctypes.c_int
            lib.colmap_fast_num_images.argtypes = [ctypes.c_void_p]
            lib.colmap_fast_image_name.restype = ctypes.c_int
            lib.colmap_fast_image_name.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.colmap_fast_splat.restype = ctypes.c_int
            lib.colmap_fast_splat.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_int, ctypes.c_int, f32p, f32p, i32p, f32p, f32p,
                ctypes.c_int]
            _LIB = lib
            return _LIB
    return None


def available() -> bool:
    return _find_lib() is not None


def load_colmap_sparse_depth_native(scene_dir, img_wh, factor, bds_raw,
                                    bd_factor=0.75,
                                    max_pts: int = 65536) -> List[dict]:
    """Native-path equivalent of
    ``ucnerf_tpu.data.base.load_colmap_sparse_depth``."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("libcolmap_fast.so not built; run `make -C native`")
    sparse_dir = os.path.join(scene_dir, "sparse", "0")
    handle = lib.colmap_fast_load(sparse_dir.encode())
    if not handle:
        raise RuntimeError(f"failed to load COLMAP model at {sparse_dir}")
    try:
        n = lib.colmap_fast_num_images(handle)
        w_img, h_img = img_wh
        sc = 1.0 / (float(np.min(bds_raw)) * bd_factor)
        bds = np.asarray(bds_raw, np.float64)
        if bds.ndim == 1:
            bds = np.broadcast_to(bds, (n, 2))
        # bds_raw rows follow image-id order in the reference; our entries
        # are name-sorted like the reference's final output, and LLFF
        # poses_bounds rows are name-sorted too, so index directly.
        entries = []
        for i in range(n):
            name_buf = ctypes.create_string_buffer(512)
            lib.colmap_fast_image_name(handle, i, name_buf, 512)
            depth_img = np.zeros((h_img, w_img), np.float32)
            weight_img = np.zeros((h_img, w_img), np.float32)
            coords = np.zeros((max_pts, 2), np.int32)
            depths = np.zeros((max_pts,), np.float32)
            weights = np.zeros((max_pts,), np.float32)
            lo, hi = float(bds[min(i, len(bds) - 1), 0]), \
                float(bds[min(i, len(bds) - 1), 1])
            cnt = lib.colmap_fast_splat(
                handle, i, float(factor), sc, lo, hi, w_img, h_img,
                depth_img, weight_img, coords, depths, weights, max_pts)
            entries.append(dict(
                name=name_buf.value.decode(),
                depth_img=depth_img, weight_img=weight_img,
                coords=coords[:cnt].copy(), depths=depths[:cnt].copy(),
                weights=weights[:cnt].copy()))
        return entries
    finally:
        lib.colmap_fast_free(handle)
