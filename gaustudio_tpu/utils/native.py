"""ctypes bindings for the native IO library (native/gsio.cpp).

Builds lazily with `make` on first use; every entry point has a pure-python
fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsio.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.gsio_points3d_count.restype = ctypes.c_longlong
    lib.gsio_points3d_count.argtypes = [ctypes.c_char_p]
    lib.gsio_read_points3d.restype = ctypes.c_int
    lib.gsio_read_points3d.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.uint8),
        np.ctypeslib.ndpointer(np.float64), ctypes.c_longlong,
    ]
    lib.gsio_images_counts.restype = ctypes.c_int
    lib.gsio_images_counts.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.gsio_read_images.restype = ctypes.c_int
    lib.gsio_read_images.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_char_p, ctypes.c_longlong,
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int64),
        ctypes.c_longlong, ctypes.c_longlong,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_points3d_binary(path: str) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native points3D.bin reader; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.gsio_points3d_count(str(path).encode())
    if n < 0:
        raise IOError(f"failed to read {path}")
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    rc = lib.gsio_read_points3d(str(path).encode(), xyz.reshape(-1), rgb.reshape(-1),
                                err, n)
    if rc < 0:
        raise IOError(f"native points3D parse error {rc} for {path}")
    return xyz, rgb.astype(np.float64), err.reshape(-1, 1)


def read_images_binary(path: str):
    """Native images.bin reader -> dict[id -> (qvec, tvec, camera_id, name,
    xys, point3D_ids)]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n_img = ctypes.c_longlong()
    t2d = ctypes.c_longlong()
    nb = ctypes.c_longlong()
    rc = lib.gsio_images_counts(str(path).encode(), ctypes.byref(n_img),
                                ctypes.byref(t2d), ctypes.byref(nb))
    if rc < 0:
        raise IOError(f"failed to read {path}")
    n, t, b = n_img.value, t2d.value, nb.value
    ids = np.empty(n, np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names_buf = ctypes.create_string_buffer(b + 1)
    n2d = np.empty(n, np.int64)
    xys = np.empty((t, 2), np.float64)
    p3d = np.empty(t, np.int64)
    rc = lib.gsio_read_images(str(path).encode(), ids, qvec.reshape(-1),
                              tvec.reshape(-1), cam_ids, names_buf, b + 1,
                              n2d, xys.reshape(-1), p3d, n, t)
    if rc < 0:
        raise IOError(f"native images parse error {rc} for {path}")
    names = names_buf.value.decode("utf-8").split("\n")[:n]
    out = {}
    off = 0
    for i in range(n):
        k = int(n2d[i])
        out[int(ids[i])] = (qvec[i], tvec[i], int(cam_ids[i]), names[i],
                            xys[off:off + k], p3d[off:off + k])
        off += k
    return out
