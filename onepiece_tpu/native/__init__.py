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
