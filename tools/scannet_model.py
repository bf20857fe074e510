#!/usr/bin/env python
"""GenerateModelFromScannet: GT-pose TSDF reconstruction of a ScanNet scan.

CLI rebuild of ref example/GenerateModelFromScannet.cpp:30-66 — read the
ScanNet export (frame-XXXXXX.{color.jpg,depth.pgm,pose.txt} + _info.txt),
integrate every `stride`-th frame into the voxel-hashed TSDF at the given
ground-truth poses, extract the marching-cubes mesh, and write PLY.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="ScanNet export dir (with _info.txt)")
    ap.add_argument("output", nargs="?", default="scannet_model.ply")
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.integration.blocks import TSDFVolume
    from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh
    from onepiece_tpu.io.scannet import ScanNetSequence
    from onepiece_tpu.ops.image import bilateral_filter

    seq = ScanNetSequence(args.root, args.max_frames)
    cam = seq.camera
    print(f"{len(seq)} frames, depth camera {cam.width}x{cam.height}")
    vol = TSDFVolume(voxel_size=args.voxel, truncation=args.voxel * 5)
    used = 0
    for i in range(0, len(seq), args.stride):
        _, rgb, depth, pose = seq[i]
        if not np.isfinite(pose).all():
            continue  # ScanNet marks untracked frames with -inf poses
        d = bilateral_filter(jnp.asarray(depth))
        rgbj = (
            jnp.asarray(rgb, jnp.float32) / 255.0
            if rgb is not None
            else jnp.zeros((*depth.shape, 3), jnp.float32)
        )
        vol.integrate(d, rgbj, jnp.asarray(pose, jnp.float32), cam)
        used += 1
        if used % 10 == 0:
            print(f"  frame {i}: {vol.num_active} active blocks")
    print(f"integrated {used} frames, {vol.num_active} blocks")
    tv, tc = vol.extract_mesh()
    verts, faces, cols = dedup_triangle_soup(tv, tc)
    write_ply_mesh(args.output, verts, faces, colors=cols)
    print(f"mesh: {len(verts)} verts {len(faces)} faces -> {args.output}")


if __name__ == "__main__":
    main()
