"""ctypes loader/builder for the native morphology kernels.

Compiles ``cpp/morpho_native.cpp`` into a shared object on first use
(g++ -O3 -fopenmp) and exposes ``zhang_suen_thin_batch``. Falls back to
the pure-numpy implementation when no toolchain is available; results
are bit-identical either way (tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cpp_source() -> str:
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    return os.path.join(pkg_root, "cpp", "morpho_native.cpp")


def _so_path() -> str:
    cache = os.path.join(os.path.expanduser("~"), ".cache", "arvae_native")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "morpho_native.so")


def _build() -> Optional[str]:
    src = _cpp_source()
    so = _so_path()
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        try:  # retry without -march=native / openmp
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True, timeout=120,
            )
            return so
        except Exception:
            return None


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("ARVAE_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.zhang_suen_thin_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.morpho_native_abi_version.restype = ctypes.c_int
            assert lib.morpho_native_abi_version() == 1
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def zhang_suen_thin_batch(
    images: np.ndarray, max_iter: int = 200
) -> Optional[np.ndarray]:
    """(N, H, W) binary uint8/bool → thinned batch, or None if the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    # binarize exactly like the numpy fallback's astype(bool): any
    # nonzero pixel is foreground (a bare uint8 cast truncates 0<v<1
    # floats to background, diverging the two paths on grayscale input)
    imgs = np.ascontiguousarray(images.astype(bool).astype(np.uint8))
    n, h, w = imgs.shape
    out = np.empty_like(imgs)
    lib.zhang_suen_thin_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, max_iter,
    )
    return out.astype(bool)
