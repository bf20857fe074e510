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
        import cv2

        ts, rgb_rel, depth_rel = self.pairs[i]
        bgr = cv2.imread(os.path.join(self.root, rgb_rel), cv2.IMREAD_COLOR)
        rgb = bgr[:, :, ::-1].copy()
        d16 = cv2.imread(os.path.join(self.root, depth_rel), cv2.IMREAD_UNCHANGED)
        depth = d16.astype(np.float32) / self.depth_scale
        return ts, rgb, depth

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
) -> np.ndarray:
    """Render a synthetic sequence into TUM on-disk format; returns GT poses."""
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
