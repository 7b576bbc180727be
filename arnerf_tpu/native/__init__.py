"""ctypes bindings for the native data-IO runtime (libdataio.so).

Auto-builds on first use when a toolchain is available; every caller has a
pure-Python fallback, so missing native support degrades to the reference's
per-image loop, never to an error."""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    so = os.path.join(here, "libdataio.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["bash", os.path.join(here, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.dataio_load_images.restype = ctypes.c_int
        lib.dataio_load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def load_images_batch(paths, img_wh, blend_a=True, n_threads=0):
    """Threaded decode+resize of many images -> (n, W*H, 3) float32, or
    None if native support is unavailable (callers fall back to Python).

    blend_a semantics match datasets/color_utils.read_image: True blends
    alpha to white, False premultiplies."""
    lib = _get_lib()
    if lib is None or not paths:
        return None
    w, h = img_wh
    n = len(paths)
    out = np.empty((n, h * w * 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.dataio_load_images(
        arr, n, w, h, 1 if blend_a else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if failed:
        return None  # let the Python path produce proper errors
    return out.reshape(n, h * w, 3)


def write_exr(path, img):
    """Write (H, W, 3) float32 as half-float EXR. Returns True on success."""
    lib = _get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape[:2]
    lib.dataio_write_exr.restype = ctypes.c_int
    lib.dataio_write_exr.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_float)]
    return lib.dataio_write_exr(
        path.encode(), w, h,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float))) == 0
