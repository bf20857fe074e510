"""Shared helpers for the CLI tools (dataset loading, camera selection)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onepiece_tpu.geometry.camera import PRESETS, PinholeCamera, TUM_CAMERA  # noqa: E402
from onepiece_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()


def add_dataset_args(ap):
    ap.add_argument("--dataset", type=str, default=None, help="TUM-format dataset dir")
    ap.add_argument("--synthetic", type=int, default=0, help="render N synthetic frames instead")
    ap.add_argument("--camera", type=str, default="tum", choices=list(PRESETS))
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--scale", type=int, default=1, help="downscale factor for camera/synthetic render")


def scaled_camera(cam: PinholeCamera, scale: int) -> PinholeCamera:
    c = cam
    while scale > 1:
        c = c.next_pyramid_level()
        scale //= 2
    return c


def load_frames(args):
    """Yields (timestamp, gray (H, W) [0, 1] float32, depth (H, W) float32 m)
    plus returns (camera, gt_poses or None)."""
    cam = scaled_camera(PRESETS[args.camera], args.scale)
    if args.synthetic:
        import jax.numpy as jnp

        from onepiece_tpu.utils import synthetic

        n = args.max_frames or args.synthetic
        n = min(n, args.synthetic)
        scene = synthetic.default_scene()
        poses = synthetic.orbit_trajectory(args.synthetic)[:n]

        def gen():
            for i in range(n):
                d, g = synthetic.render(
                    scene, jnp.asarray(poses[i]), cam.fx, cam.fy, cam.cx, cam.cy,
                    cam.height, cam.width, num_steps=64,
                )
                yield i / 30.0, np.asarray(g), np.asarray(d)

        return gen(), cam, poses

    from onepiece_tpu.io.tum import TumSequence

    seq = TumSequence(args.dataset, depth_scale=cam.depth_scale, max_frames=args.max_frames)
    gt = seq.groundtruth()

    def gen():
        # native prefetch ring: frame N+k decodes on host CPUs while frame
        # N's device program runs (io/native_loader.py)
        for i, (depth, gray) in enumerate(seq.stream(gray=True)):
            yield seq.pairs[i][0], gray, depth

    return gen(), cam, (gt[1] if gt else None)
