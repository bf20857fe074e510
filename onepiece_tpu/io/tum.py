"""TUM RGB-D dataset IO.

Rebuild of the reference's TUM reading (ref: src/Tool/IO.cpp:59-108
`ReadImageSequence` / `ReadImageSequenceWithPose`): parses the
`rgb.txt`/`depth.txt` listings (or a pre-associated `associate.txt`),
pairs color/depth by nearest timestamp, loads 16-bit depth PNGs with the
camera's depth_scale, and reads `groundtruth.txt` trajectories. Also
includes a writer that renders a synthetic sequence into the same on-disk
format so every CLI tool can be exercised without network access.
"""

from __future__ import annotations

import os

import numpy as np


def _read_listing(path: str) -> list[tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def associate(
    a: list[tuple[float, str]], b: list[tuple[float, str]], max_dt: float = 0.02
) -> list[tuple[float, str, str]]:
    """Greedy nearest-timestamp association (TUM associate.py semantics)."""
    out = []
    bi = 0
    used = set()
    for ta, fa in a:
        best, best_dt = None, max_dt
        for j in range(max(0, bi - 3), len(b)):
            tb, fb = b[j]
            dt = abs(tb - ta)
            if dt <= best_dt and j not in used:
                best, best_dt = j, dt
            if tb > ta + max_dt:
                break
        if best is not None:
            used.add(best)
            bi = best
            out.append((ta, fa, b[best][1]))
    return out


def _decode_depth16(path: str) -> np.ndarray:
    """16-bit grayscale PNG via the native decoder; imageio fallback."""
    try:
        import ctypes

        from ..native import get_rgbd_lib

        lib = get_rgbd_lib()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        bd = ctypes.c_int()
        if lib.png_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(ch), ctypes.byref(bd)) != 0:
            raise IOError(path)
        out = np.empty((h.value, w.value), np.uint16)
        rc = lib.png_decode_u16(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            w.value, h.value,
        )
        if rc != 0:
            raise IOError(f"{path}: rc={rc}")
        return out
    except Exception:  # pragma: no cover
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path)).astype(np.uint16)


def _decode_rgb(path: str) -> np.ndarray:
    """8-bit RGB PNG via the native decoder; imageio fallback."""
    try:
        import ctypes

        from ..native import get_rgbd_lib

        lib = get_rgbd_lib()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        bd = ctypes.c_int()
        if lib.png_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(ch), ctypes.byref(bd)) != 0:
            raise IOError(path)
        out = np.empty((h.value, w.value, ch.value), np.uint8)
        rc = lib.png_decode_u8(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w.value, h.value, ch.value,
        )
        if rc != 0:
            raise IOError(f"{path}: rc={rc}")
        if ch.value == 1:
            out = np.repeat(out, 3, axis=-1)
        return out[..., :3]
    except Exception:  # pragma: no cover
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path))
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        return img[..., :3].astype(np.uint8)


class TumSequence:
    """Iterates (timestamp, rgb (H, W, 3) uint8, depth (H, W) float32 meters)."""

    def __init__(self, root: str, depth_scale: float = 5000.0, max_frames: int | None = None):
        self.root = root
        self.depth_scale = depth_scale
        assoc_path = os.path.join(root, "associate.txt")
        if os.path.exists(assoc_path):
            pairs = []
            with open(assoc_path) as f:
                for line in f:
                    p = line.split()
                    if len(p) >= 4:
                        pairs.append((float(p[0]), p[1], p[3]))
            self.pairs = pairs
        else:
            rgb = _read_listing(os.path.join(root, "rgb.txt"))
            depth = _read_listing(os.path.join(root, "depth.txt"))
            self.pairs = associate(rgb, depth)
        if max_frames:
            self.pairs = self.pairs[:max_frames]

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        ts, rgb_rel, depth_rel = self.pairs[i]
        rgb = _decode_rgb(os.path.join(self.root, rgb_rel))
        d16 = _decode_depth16(os.path.join(self.root, depth_rel))
        depth = d16.astype(np.float32) / self.depth_scale
        return ts, rgb, depth

    def stream(self, gray: bool = True, n_threads: int = 2, ring: int = 4):
        """Prefetching iterator over (depth_m, gray/rgb) via the native C++
        decoder ring (io/native_loader.py) — decodes frame N+k on host CPUs
        while frame N's device program runs."""
        from .native_loader import PrefetchingRGBDLoader

        pairs = [
            (os.path.join(self.root, d), os.path.join(self.root, r))
            for _, r, d in self.pairs
        ]
        return PrefetchingRGBDLoader(
            pairs, depth_scale=self.depth_scale, gray=gray,
            n_threads=n_threads, ring=ring,
        )

    def groundtruth(self):
        """Returns (timestamps, poses (N, 4, 4)) from groundtruth.txt or None."""
        path = os.path.join(self.root, "groundtruth.txt")
        if not os.path.exists(path):
            return None
        from .trajectory import read_tum_trajectory

        return read_tum_trajectory(path)


def write_synthetic_tum(
    root: str,
    num_frames: int = 30,
    camera=None,
    num_steps: int = 64,
    corrupt: bool = False,
    corrupt_seed: int = 1000,
    textureless: tuple[int, int] | None = None,
) -> np.ndarray:
    """Render a synthetic sequence into TUM on-disk format; returns GT poses.

    `corrupt` applies the sensor model (utils/synthetic.corrupt_rgbd:
    Kinect-style depth noise + dropout holes + gray noise) with per-frame
    seeds, matching bench.py's in-memory corruption bit-for-bit after the
    PNG round trip."""
    import cv2
    import jax.numpy as jnp

    from ..geometry.camera import TUM_CAMERA
    from ..utils import synthetic
    from .trajectory import write_tum_trajectory

    camera = camera or TUM_CAMERA
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(num_frames)
    rgb_lines, depth_lines = [], []
    for i in range(num_frames):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), camera.fx, camera.fy, camera.cx,
            camera.cy, camera.height, camera.width, num_steps=num_steps,
        )
        if corrupt:
            rng = np.random.default_rng(corrupt_seed + i)
            c = 0.06 if textureless and textureless[0] <= i < textureless[1] else 1.0
            g, d = synthetic.corrupt_rgbd(rng, np.asarray(g), np.asarray(d), contrast=c)
        ts = i / 30.0
        g8 = np.clip(np.asarray(g) * 255, 0, 255).astype(np.uint8)
        rgb_img = np.stack([g8, g8, g8], -1)
        d16 = np.clip(np.asarray(d) * camera.depth_scale, 0, 65535).astype(np.uint16)
        rn = f"rgb/{ts:.6f}.png"
        dn = f"depth/{ts:.6f}.png"
        cv2.imwrite(os.path.join(root, rn), rgb_img[:, :, ::-1])
        cv2.imwrite(os.path.join(root, dn), d16)
        rgb_lines.append(f"{ts:.6f} {rn}")
        depth_lines.append(f"{ts:.6f} {dn}")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# ts filename\n" + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("# ts filename\n" + "\n".join(depth_lines) + "\n")
    ts = np.arange(num_frames) / 30.0
    write_tum_trajectory(os.path.join(root, "groundtruth.txt"), ts, poses)
    return poses
