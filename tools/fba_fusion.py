#!/usr/bin/env python
"""FBAFusion: sparse keyframe SLAM with loop closure + pose-graph BA.

CLI rebuild of ref example/FBAFusion/FBAFusion.cpp:10-105: FBASlam frame
loop, then TSDF reconstruction at optimised poses and trajectory output.

Default engine is the fully device-resident chunked path
(systems/fused_sparse.FusedFBASlam, one dispatch + one fetch per chunk);
--per-frame selects the host-loop FBASlam (reference-shaped control flow).
--checkpoint/--resume provide full-SLAM-state restart.
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
    ap.add_argument("--per-frame", action="store_true",
                    help="host-loop FBASlam instead of the fused chunked path")
    ap.add_argument("--chunk", type=int, default=16,
                    help="frames per device dispatch (fused path)")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="write a full-SLAM-state checkpoint here at the end (fused path)")
    ap.add_argument("--resume", type=str, default=None,
                    help="resume from a checkpoint written by --checkpoint")
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.systems.fbaslam import FBASlam

    frames, cam, gt = load_frames(args)
    kept = []
    if args.per_frame:
        slam = FBASlam(cam, fast_threshold=args.fast_threshold,
                       keyframe_disparity=args.keyframe_disparity)
        t0 = time.perf_counter()
        for ts, gray, depth in frames:
            info = slam.update_frame(gray, depth)
            if info["frame"] % args.integrate_stride == 0:
                kept.append((info["frame"], gray, depth))
            tag = "KF" if info.get("keyframe") else "  "
            if info["frame"] % 10 == 0 or info.get("keyframe"):
                print(f"frame {info['frame']} {tag} success={info['success']} disp={info.get('disparity', 0):.1f}")
        n = slam.frame_count
        dt = time.perf_counter() - t0
        print(f"slam: {n} frames, {len(slam.keyframe_frames)} keyframes, "
              f"{len(slam.edges)} edges in {dt:.2f}s ({n / dt:.2f} fps)")
    else:
        from onepiece_tpu.systems.fused_sparse import FusedFBASlam
        from onepiece_tpu.utils import checkpoint as ckpt

        if args.resume:
            slam = ckpt.load(args.resume, cam)
            print(f"resumed from {args.resume} at frame {slam.frame_count}")
        else:
            slam = FusedFBASlam(cam, fast_threshold=args.fast_threshold,
                                keyframe_disparity=args.keyframe_disparity)
        t0 = time.perf_counter()
        buf = []
        fidx = slam.frame_count
        for ts, gray, depth in frames:
            buf.append((gray, depth))
            if fidx % args.integrate_stride == 0:
                kept.append((fidx, gray, depth))
            fidx += 1
            if len(buf) == args.chunk:
                info = slam.process_chunk(
                    np.stack([g for g, _ in buf]), np.stack([d for _, d in buf]))
                print(f"chunk -> {info}")
                buf.clear()
        if buf:
            info = slam.process_chunk(
                np.stack([g for g, _ in buf]), np.stack([d for _, d in buf]))
            print(f"chunk -> {info}")
        n = slam.frame_count
        dt = time.perf_counter() - t0
        print(f"slam: {n} frames, {slam.num_kf} keyframes, "
              f"{slam.num_edges} edges ({slam.lc_edges_total} LC) in {dt:.2f}s ({n / dt:.2f} fps)")
        if args.checkpoint:
            ckpt.save(slam, args.checkpoint)
            print(f"checkpoint -> {args.checkpoint}")

    poses = slam.trajectory()
    traj.write_matrix_trajectory(args.out_traj, poses)
    if gt is not None:
        m = min(len(poses), len(gt))
        print(f"ATE RMSE (first {m} frames): {traj.ate_rmse(poses[:m], gt[:m]):.5f} m")

    if args.out_mesh:
        from onepiece_tpu.integration.blocks import TSDFVolume
        from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh
        from onepiece_tpu.ops.image import bilateral_filter

        vol = TSDFVolume(voxel_size=args.voxel, truncation=args.voxel * 5)
        for fidx, gray, depth in kept:
            d = bilateral_filter(jnp.asarray(depth))
            rgb = jnp.stack([jnp.asarray(gray)] * 3, -1)
            vol.integrate(d, rgb, jnp.asarray(poses[fidx], jnp.float32), cam)
        tv, tc = vol.extract_mesh()
        verts, faces, cols = dedup_triangle_soup(tv, tc)
        write_ply_mesh(args.out_mesh, verts, faces, colors=cols)
        print(f"mesh: {len(verts)} verts {len(faces)} faces -> {args.out_mesh}")


if __name__ == "__main__":
    main()
