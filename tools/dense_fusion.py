#!/usr/bin/env python
"""DenseFusion: dense SLAM + TSDF reconstruction end-to-end.

CLI rebuild of ref example/DenseFusion/DenseFusion.cpp:9-112: runs the
DenseSlam frame loop (dense VO + submap registration + pose graph), then
post-hoc TSDF-integrates every k-th frame with bilateral-filtered depth at
the optimised poses, extracts the marching-cubes mesh, and writes
trajectory.txt + mesh PLY.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--out-mesh", type=str, default="mesh.ply")
    ap.add_argument("--turntable", type=str, default="",
                    help="directory for a rotating-view PNG sequence + GIF of the final mesh")
    ap.add_argument("--turntable", type=str, default="",
                    help="directory for a rotating-view PNG sequence + GIF of the final mesh")
    ap.add_argument("--out-traj", type=str, default="trajectory.txt")
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--integrate-stride", type=int, default=8,
                    help="integrate every k-th frame (ref DenseFusion.cpp per-8th)")
    ap.add_argument("--submap-size", type=int, default=50)
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.integration.blocks import TSDFVolume
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh
    from onepiece_tpu.ops.image import bilateral_filter
    from onepiece_tpu.systems.dense_slam import DenseSlam

    frames, cam, gt = load_frames(args)
    slam = DenseSlam(cam, submap_size=args.submap_size)
    kept = []  # (gray, depth) for integration
    t0 = time.perf_counter()
    for ts, gray, depth in frames:
        info = slam.update_frame(gray, depth)
        if info["frame"] % args.integrate_stride == 0:
            kept.append((info["frame"], gray, depth))
        if info["frame"] % 10 == 0:
            print(f"frame {info['frame']}: rmse {info.get('rmse', 0):.5f} submap {info['submap']}")
    n = slam.frame_count
    dt = time.perf_counter() - t0
    print(f"slam: {n} frames in {dt:.2f}s ({n / dt:.2f} fps)")

    poses = slam.trajectory()
    traj.write_matrix_trajectory(args.out_traj, poses)
    if gt is not None:
        print(f"ATE RMSE: {traj.ate_rmse(poses, gt[: len(poses)]):.5f} m")

    # post-hoc reconstruction at optimised poses (ref DenseFusion.cpp:64-110)
    vol = TSDFVolume(voxel_size=args.voxel, truncation=args.voxel * 5)
    t1 = time.perf_counter()
    for fidx, gray, depth in kept:
        d = bilateral_filter(jnp.asarray(depth))
        rgb = jnp.stack([jnp.asarray(gray)] * 3, -1)
        vol.integrate(d, rgb, jnp.asarray(poses[fidx], jnp.float32), cam)
    print(f"integrated {len(kept)} frames in {time.perf_counter() - t1:.2f}s; blocks {vol.num_active}")

    tv, tc = vol.extract_mesh()
    verts, faces, cols = dedup_triangle_soup(tv, tc)
    write_ply_mesh(args.out_mesh, verts, faces, colors=cols)
    print(f"mesh: {len(verts)} verts {len(faces)} faces -> {args.out_mesh}")
    if args.turntable:
        import os as _os

        from render_turntable import render_turntable

        render_turntable(
            np.asarray(verts), np.asarray(faces), args.turntable,
            colors=None if cols is None else np.asarray(cols),
            gif=_os.path.join(args.turntable, "turntable.gif"),
        )


if __name__ == "__main__":
    main()
