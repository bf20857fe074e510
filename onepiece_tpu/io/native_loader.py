"""Prefetching RGB-D sequence loader backed by the native C++ decoder.

Runtime counterpart of the reference's synchronous per-frame `cv::imread`
loop (ref: example/DenseFusion/DenseFusion.cpp:41-47, src/Tool/IO.cpp:
59-108): a C++ worker pool (onepiece_tpu/native/rgbd_loader.cpp) decodes
PNGs ahead of the consumer into a ring buffer, so frame N+k decodes on host
CPUs while frame N's device program runs. Falls back to imageio when the
native library can't build.

Usage:
    for depth_m, gray in PrefetchingRGBDLoader(pairs, depth_scale=5000.0):
        slam.process_frame(gray, depth_m)
"""

from __future__ import annotations

import ctypes

import numpy as np


class PrefetchingRGBDLoader:
    """Iterate (depth_meters float32, gray float32 in [0,1]) frames.

    pairs: list of (depth_png_path, rgb_png_path_or_None).
    """

    def __init__(
        self,
        pairs: list[tuple[str, str | None]],
        depth_scale: float = 5000.0,
        gray: bool = True,
        n_threads: int = 2,
        ring: int = 4,
    ):
        self.pairs = pairs
        self.depth_scale = float(depth_scale)
        self.gray = gray
        self._native = None
        self._handle = None
        if not pairs:
            return
        try:
            from ..native import get_rgbd_lib

            lib = get_rgbd_lib()
            w = ctypes.c_int()
            h = ctypes.c_int()
            ch = ctypes.c_int()
            bd = ctypes.c_int()
            rc = lib.png_probe(
                pairs[0][0].encode(), ctypes.byref(w), ctypes.byref(h),
                ctypes.byref(ch), ctypes.byref(bd),
            )
            if rc != 0 or bd.value != 16:
                raise RuntimeError(f"probe failed rc={rc} bitdepth={bd.value}")
            self.width, self.height = w.value, h.value
            n = len(pairs)
            depth_arr = (ctypes.c_char_p * n)(
                *[p[0].encode() for p in pairs]
            )
            has_rgb = pairs[0][1] is not None
            rgb_arr = (
                (ctypes.c_char_p * n)(*[(p[1] or "").encode() for p in pairs])
                if has_rgb
                else None
            )
            self._rgb_ch = (1 if gray else 3) if has_rgb else 0
            self._handle = lib.loader_create(
                depth_arr, rgb_arr, n, self.width, self.height,
                self._rgb_ch, n_threads, ring,
            )
            # keep the path arrays alive for the loader's lifetime
            self._keepalive = (depth_arr, rgb_arr)
            self._native = lib
        except Exception:  # pragma: no cover - fallback path
            self._native = None
            import imageio.v2 as imageio

            self._imageio = imageio
            d0 = imageio.imread(pairs[0][0])
            self.height, self.width = d0.shape[:2]

    def __len__(self) -> int:
        return len(self.pairs)

    def __iter__(self):
        if self._native is not None:
            yield from self._iter_native()
        else:
            yield from self._iter_fallback()

    def _iter_native(self):
        lib = self._native
        h, w = self.height, self.width
        depth_buf = np.empty((h, w), np.uint16)
        rgb_buf = (
            np.empty((h, w) if self._rgb_ch == 1 else (h, w, 3), np.uint8)
            if self._rgb_ch
            else None
        )
        dp = depth_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        rp = (
            rgb_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            if rgb_buf is not None
            else None
        )
        try:
            for _ in range(len(self.pairs)):
                rc = lib.loader_next(self._handle, dp, rp)
                if rc < 0:
                    raise IOError(f"native decode failed rc={rc}")
                depth_m = depth_buf.astype(np.float32) / self.depth_scale
                if rgb_buf is None:
                    yield depth_m, None
                elif self._rgb_ch == 1:
                    yield depth_m, rgb_buf.astype(np.float32) / 255.0
                else:
                    yield depth_m, rgb_buf.astype(np.float32) / 255.0
        finally:
            self.close()

    def _iter_fallback(self):  # pragma: no cover - exercised without libpng
        for dpath, cpath in self.pairs:
            d = self._imageio.imread(dpath).astype(np.float32) / self.depth_scale
            c = None
            if cpath is not None:
                img = self._imageio.imread(cpath).astype(np.float32) / 255.0
                if self.gray and img.ndim == 3:
                    c = img[..., :3] @ np.array([0.299, 0.587, 0.114], np.float32)
                else:
                    c = img
            yield d, c

    def close(self) -> None:
        if self._native is not None and self._handle:
            self._native.loader_destroy(self._handle)
            self._handle = None
