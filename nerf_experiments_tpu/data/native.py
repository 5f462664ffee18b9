"""ctypes bindings for the native C++ data-pipeline kernels.

Builds `native/libnetpu_data.so` on first use (g++, OpenMP) and exposes:
  * compute_rays(c2w, H, W, focal) -> (origins, dirs)
  * blur_pyramid(images, sigmas) -> (N, H, W, n_sigmas, C)
  * apply_pose_noise(origs, dirs, rot, trans)

Everything degrades gracefully to the numpy implementations in
`data/blender.py` when the toolchain is unavailable (`available()`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnetpu_data.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.compute_rays.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            _f32p, _f32p,
        ]
        lib.blur_pyramid.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, _f32p,
        ]
        lib.apply_pose_noise.argtypes = [
            _f32p, _f32p, ctypes.c_int, ctypes.c_int, _f32p, _f32p, _f32p, _f32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def compute_rays(
    c2w: np.ndarray, height: int, width: int, focal: float
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None, "native library unavailable"
    c2w = np.ascontiguousarray(c2w, np.float32)
    n = c2w.shape[0]
    origs = np.empty((n, height * width, 3), np.float32)
    dirs = np.empty((n, height * width, 3), np.float32)
    lib.compute_rays(c2w, n, height, width, float(focal), origs, dirs)
    return origs, dirs


def blur_pyramid(images: np.ndarray, sigmas: Sequence[float]) -> np.ndarray:
    """images (N, H, W, C) float32 -> (N, H, W, n_sigmas, C)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    images = np.ascontiguousarray(images, np.float32)
    n, h, w, c = images.shape
    sig = np.asarray(list(sigmas), np.float32)
    out = np.empty((n, h, w, len(sigmas), c), np.float32)
    lib.blur_pyramid(images, n, h, w, c, sig, len(sigmas), out)
    return out


def apply_pose_noise(
    origs: np.ndarray, dirs: np.ndarray, rot: np.ndarray, trans: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None, "native library unavailable"
    origs = np.ascontiguousarray(origs, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    n, hw, _ = origs.shape
    out_o = np.empty_like(origs)
    out_d = np.empty_like(dirs)
    lib.apply_pose_noise(
        origs, dirs, n, hw,
        np.ascontiguousarray(rot, np.float32),
        np.ascontiguousarray(trans, np.float32),
        out_o, out_d,
    )
    return out_o, out_d
