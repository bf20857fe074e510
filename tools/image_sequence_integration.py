#!/usr/bin/env python
"""TSDF integration with known poses -> marching-cubes mesh.

CLI rebuild of ref example/ImageSequenceIntegration.cpp:27-58 (and
MCGenerateMesh): isolates the reconstruction stack from odometry by
integrating at ground-truth/trajectory poses.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--trajectory", type=str, default="",
                    help="16-float-row trajectory; defaults to dataset GT")
    ap.add_argument("--out-mesh", type=str, default="mesh.ply")
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.integration.blocks import TSDFVolume
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh

    frames, cam, gt = load_frames(args)
    poses = traj.read_matrix_trajectory(args.trajectory) if args.trajectory else gt
    if poses is None:
        raise SystemExit("no trajectory available (pass --trajectory or use GT)")

    vol = TSDFVolume(voxel_size=args.voxel, truncation=args.voxel * 5)
    t0 = time.perf_counter()
    count = 0
    for i, (ts, gray, depth) in enumerate(frames):
        if i >= len(poses):
            break
        if i % args.stride:
            continue
        rgb = jnp.stack([jnp.asarray(gray)] * 3, -1)
        vol.integrate(jnp.asarray(depth), rgb, jnp.asarray(poses[i], jnp.float32), cam)
        count += 1
    dt = time.perf_counter() - t0
    print(f"integrated {count} frames in {dt:.2f}s ({count / dt:.2f} fps); blocks {vol.num_active}")

    tv, tc = vol.extract_mesh()
    verts, faces, cols = dedup_triangle_soup(tv, tc)
    write_ply_mesh(args.out_mesh, verts, faces, colors=cols)
    print(f"mesh: {len(verts)} verts {len(faces)} faces -> {args.out_mesh}")


if __name__ == "__main__":
    main()
