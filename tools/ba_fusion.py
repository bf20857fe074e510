#!/usr/bin/env python
"""BAFusion: sparse keyframe SLAM with world-point tracks + full BA.

CLI rebuild of ref example/BAFusion/BAFusion.cpp: BASlam frame loop (sparse
MILD VO, keyframes, loop closure, full bundle adjustment over world points),
then trajectory output and optional TSDF mesh at optimised poses.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--out-mesh", type=str, default="")
    ap.add_argument("--out-traj", type=str, default="trajectory.txt")
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--integrate-stride", type=int, default=8)
    ap.add_argument("--fast-threshold", type=float, default=0.01)
    ap.add_argument("--keyframe-disparity", type=float, default=30.0)
    ap.add_argument("--ba-every", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=0,
                    help="process frames in chunks of this size via the "
                         "on-device keyframe scan (0 = per-frame loop)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.systems.baslam import BASlam

    frames, cam, gt = load_frames(args)
    slam = BASlam(cam, fast_threshold=args.fast_threshold, ba_every=args.ba_every,
                   keyframe_disparity=args.keyframe_disparity)
    kept = []
    t0 = time.perf_counter()
    if args.chunk > 0:
        buf = []
        for fi, (ts, gray, depth) in enumerate(frames):
            buf.append((gray, depth))
            if fi % args.integrate_stride == 0:
                kept.append((fi, gray, depth))
            if len(buf) == args.chunk:
                info = slam.process_chunk(
                    np.stack([g for g, _ in buf]), np.stack([d for _, d in buf]))
                print(f"chunk -> {info}")
                buf = []
        if buf:
            info = slam.process_chunk(
                np.stack([g for g, _ in buf]), np.stack([d for _, d in buf]))
            print(f"chunk -> {info}")
    else:
        for ts, gray, depth in frames:
            info = slam.update_frame(gray, depth)
            if info["frame"] % args.integrate_stride == 0:
                kept.append((info["frame"], gray, depth))
            tag = "KF" if info.get("keyframe") else "  "
            if info["frame"] % 10 == 0 or info.get("keyframe"):
                print(
                    f"frame {info['frame']} {tag} success={info['success']} "
                    f"tracks={len(slam.world_points)} obs={len(slam.observations)}"
                )
    n = slam.frame_count
    dt = time.perf_counter() - t0
    print(
        f"slam: {n} frames, {len(slam.keyframe_frames)} keyframes, "
        f"{len(slam.world_points)} world points, {len(slam.observations)} "
        f"observations in {dt:.2f}s ({n / dt:.2f} fps)"
    )
    err = slam.optimize()
    if err is not None:
        print(f"final BA reprojection rmse: {err:.4f} px")

    poses = slam.trajectory()
    traj.write_matrix_trajectory(args.out_traj, poses)
    print(f"trajectory -> {args.out_traj}")
    if gt is not None:
        print(f"ATE RMSE: {traj.ate_rmse(poses, np.asarray(gt)[: len(poses)]):.5f} m")

    if args.out_mesh:
        from onepiece_tpu.integration.blocks import TSDFVolume
        from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh
        from onepiece_tpu.ops.image import bilateral_filter

        vol = TSDFVolume(voxel_size=args.voxel, truncation=args.voxel * 5)
        for fidx, gray, depth in kept:
            d = bilateral_filter(jnp.asarray(depth))
            rgb = jnp.stack([jnp.asarray(gray)] * 3, -1)
            vol.integrate(d, rgb, jnp.asarray(poses[fidx]), cam)
        tv, tc = vol.extract_mesh()
        verts, faces, cols = dedup_triangle_soup(tv, tc)
        write_ply_mesh(args.out_mesh, verts, faces, colors=cols)
        print(f"mesh: {len(verts)} verts {len(faces)} faces -> {args.out_mesh}")


if __name__ == "__main__":
    main()
