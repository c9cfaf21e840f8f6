"""ctypes bindings for the native runtime library (native/).

The C++ pieces mirror the roles the reference implements natively:
dataset reading with prefetch (interface.h), dataset conversion
(se_tools/scene2raw.cpp), and fast mesh export (commons.h writers).
Everything degrades gracefully to the pure-Python paths when the library
has not been built (``make -C native``).
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsupereight_native.so")

_lib = None


def _load(build_if_missing=True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.se_raw_open.restype = ctypes.c_void_p
    lib.se_raw_open.argtypes = [ctypes.c_char_p]
    lib.se_raw_close.argtypes = [ctypes.c_void_p]
    for f in ("se_raw_width", "se_raw_height", "se_raw_num_frames"):
        getattr(lib, f).restype = ctypes.c_int
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.se_raw_read_depth.restype = ctypes.c_int
    lib.se_raw_read_depth.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
    lib.se_raw_read_rgb.restype = ctypes.c_int
    lib.se_raw_read_rgb.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_void_p]
    lib.se_raw_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.se_write_vtk.restype = ctypes.c_int
    lib.se_write_vtk.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64]
    lib.se_write_obj.restype = ctypes.c_int
    lib.se_write_obj.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64]
    lib.se_scene2raw.restype = ctypes.c_int
    lib.se_scene2raw.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeRawReader:
    """Drop-in fast path for dataset.RawDepthReader with async prefetch."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not available")
        self._lib = lib
        self._h = lib.se_raw_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open raw file {path}")
        self.width = lib.se_raw_width(self._h)
        self.height = lib.se_raw_height(self._h)
        self.num_frames = lib.se_raw_num_frames(self._h)
        self.frame = -1

    def read_frame(self, index: int):
        if index < 0 or index >= self.num_frames:
            return None, None
        depth = np.empty((self.height, self.width), np.uint16)
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        if self._lib.se_raw_read_depth(self._h, index,
                                       depth.ctypes.data) != 0:
            return None, None
        self._lib.se_raw_read_rgb(self._h, index, rgb.ctypes.data)
        # overlap the next frame's disk read with this frame's compute
        self._lib.se_raw_prefetch(self._h, index + 1)
        return depth, rgb

    def read_next(self):
        self.frame += 1
        d, rgb = self.read_frame(self.frame)
        return d, rgb, None

    def close(self):
        if self._h:
            self._lib.se_raw_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_vtk_native(path, triangles) -> bool:
    lib = _load()
    if lib is None:
        return False
    tris = np.ascontiguousarray(triangles, np.float32)
    return lib.se_write_vtk(path.encode(), tris.ctypes.data,
                            len(tris)) == 0


def write_obj_native(path, triangles) -> bool:
    lib = _load()
    if lib is None:
        return False
    tris = np.ascontiguousarray(triangles, np.float32)
    return lib.se_write_obj(path.encode(), tris.ctypes.data,
                            len(tris)) == 0


def scene2raw(scene_dir: str, out_path: str) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    return lib.se_scene2raw(scene_dir.encode(), out_path.encode())
