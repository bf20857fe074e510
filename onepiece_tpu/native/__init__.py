"""Native (C++) host-side components, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared); the .so is cached next
to the sources. Components here are the algorithms that are inherently
sequential (priority queues, union-find) and therefore belong on the host
CPU in native code — mirroring where the reference keeps them
(ref: src/Geometry/MeshSimplification.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmesh_native.so")
_SRC = os.path.join(_DIR, "mesh_native.cpp")

_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.qem_simplify.restype = ctypes.c_int
    lib.qem_simplify.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.prune_components.restype = ctypes.c_int
    lib.prune_components.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


# -- rgbd_loader: libpng decode + threaded prefetch ring ----------------------

_RGBD_LIB_PATH = os.path.join(_DIR, "librgbd_loader.so")
_RGBD_SRC = os.path.join(_DIR, "rgbd_loader.cpp")

_rgbd_lib = None


def get_rgbd_lib() -> ctypes.CDLL:
    """Lazy-build + load the native RGB-D loader (see rgbd_loader.cpp)."""
    global _rgbd_lib
    if _rgbd_lib is not None:
        return _rgbd_lib
    if (
        not os.path.exists(_RGBD_LIB_PATH)
        or os.path.getmtime(_RGBD_LIB_PATH) < os.path.getmtime(_RGBD_SRC)
    ):
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", _RGBD_SRC, "-o", _RGBD_LIB_PATH,
                "-lpng", "-lz", "-lpthread",
            ],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_RGBD_LIB_PATH)
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    lib.png_probe.restype = ctypes.c_int
    lib.png_probe.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 4
    lib.png_decode_u16.restype = ctypes.c_int
    lib.png_decode_u16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.png_decode_u8.restype = ctypes.c_int
    lib.png_decode_u8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        c_char_pp, c_char_pp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.loader_destroy.restype = None
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _rgbd_lib = lib
    return lib
