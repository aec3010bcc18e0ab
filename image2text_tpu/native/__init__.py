"""ctypes bindings for the C++ preprocessing core (native/preproc.cc).

Compiled on first use with g++ -O3 -fopenmp (cached under
~/.cache/image2text_tpu); every entry point has a numpy fallback so the
framework works without a toolchain.  See native/preproc.cc for the
rationale (torchvision-C++ equivalence).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "preproc.cc")


def _build() -> Optional[ctypes.CDLL]:
    src = _source_path()
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~"), ".cache", "image2text_tpu")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"preproc_{digest}.so")
    if not os.path.exists(so):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               src, "-o", so + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.resize_normalize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.permute_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build()
        _TRIED = True
    return _LIB


def resize_normalize_batch(images: np.ndarray, size: int, mean: np.ndarray,
                           std: np.ndarray) -> np.ndarray:
    """(b, h, w, c) uint8 → (b, c, size, size) float32, bilinear half-pixel
    resize + /255 + per-channel normalize."""
    assert images.ndim == 4 and images.dtype == np.uint8
    b, h, w, c = images.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = get_lib()
    if lib is not None:
        images = np.ascontiguousarray(images)
        out = np.empty((b, c, size, size), np.float32)
        lib.resize_normalize_batch(
            images.ctypes.data, b, h, w, c, out.ctypes.data, size,
            mean.ctypes.data, std.ctypes.data)
        return out
    # numpy fallback (same math)
    from image2text_tpu.training.data import _resize_bilinear

    out = np.stack([_resize_bilinear(im, size) for im in images]) / 255.0
    return ((out - mean[None, :, None, None]) / std[None, :, None, None]
            ).astype(np.float32)
