"""ctypes bindings for the native image codec (native/image_codec.cpp).

Builds the shared library on first use (g++, libpng/libjpeg) and falls
back to cv2/PIL when the toolchain or libraries are unavailable — the
Python pipeline keeps working either way, just slower.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpvr_codec.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decode_image_batch.restype = ctypes.c_int
        lib.decode_image_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.count_frames.restype = ctypes.c_int
        lib.count_frames.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_char_p, ctypes.c_int]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load() is not None


def decode_batch(paths, h=64, w=64, kind="png", bgr=True, n_threads=None):
    """Decode a list of image files -> (N, h, w, 3) uint8.

    bgr=True matches cv2.imread channel order (the PNG layout's files
    are written via cv2.imwrite, reference save_opt_trajectories_png).
    Raises FileNotFoundError-ish ValueError naming the failing file.
    """
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    if lib is None:
        return _decode_fallback(paths, out, kind, bgr)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    n_threads = n_threads or min(os.cpu_count() or 1, 16)
    rc = lib.decode_image_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, 0 if kind == "png" else 1, 1 if bgr else 0, n_threads)
    if rc != 0:
        raise ValueError(f"failed to decode {paths[rc - 1]}")
    return out


def _decode_fallback(paths, out, kind, bgr):
    try:
        import cv2

        for i, path in enumerate(paths):
            img = cv2.imread(path)
            if img is None:
                raise ValueError(f"failed to decode {path}")
            out[i] = img if bgr else img[..., ::-1]
        return out
    except ImportError:
        from PIL import Image

        for i, path in enumerate(paths):
            img = np.asarray(Image.open(path).convert("RGB"))
            out[i] = img[..., ::-1] if bgr else img
        return out


def count_frames(dir_path, stem, ext="png", max_steps=500):
    lib = _load()
    if lib is None:
        i = 0
        while i < max_steps and os.path.isfile(
                os.path.join(dir_path, f"{stem}_{i}.{ext}")):
            i += 1
        return i
    return lib.count_frames(dir_path.encode(), str(stem).encode(),
                            ext.encode(), max_steps)
