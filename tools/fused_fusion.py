#!/usr/bin/env python
"""FusedFusion: the production device-resident dense SLAM + TSDF pipeline.

Online variant of tools/dense_fusion.py (ref example/DenseFusion): dense VO
tracks frame-to-frame while TSDF fusion happens in the SAME device dispatch
(systems/fused_slam.py) — no post-hoc reintegration pass, zero host syncs
per frame, native prefetching loader feeding the loop. This is the
configuration bench.py measures.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--out-mesh", type=str, default="fused_mesh.ply")
    ap.add_argument("--turntable", type=str, default="",
                    help="directory for a rotating-view PNG sequence + GIF of the final mesh")
    ap.add_argument("--out-traj", type=str, default="fused_trajectory.txt")
    ap.add_argument("--voxel", type=float, default=0.0125)
    ap.add_argument("--radii", type=str, default="4,3,2",
                    help="multi-scale stencil radii coarse->fine")
    ap.add_argument("--capacity", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device dispatch (lax.scan); >1 trades "
                    "chunk-sized latency for launch-overhead-free throughput")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="write a full-SLAM-state checkpoint here at the end")
    ap.add_argument("--resume", type=str, default=None,
                    help="resume from a checkpoint written by --checkpoint")
    args = ap.parse_args()

    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh
    from onepiece_tpu.systems.fused_slam import FusedDenseFusion

    from onepiece_tpu.utils import checkpoint as ckpt

    frames, cam, gt = load_frames(args)
    radii = tuple(int(x) for x in args.radii.split(","))
    if args.resume:
        slam = ckpt.load(args.resume, cam)
        print(f"resumed from {args.resume} at frame {slam.frame_count}")
    else:
        slam = FusedDenseFusion(
            cam, voxel_size=args.voxel, truncation=args.voxel * 8,
            capacity=args.capacity, radii=radii,
        )
    t0 = time.perf_counter()
    n = 0
    if args.chunk > 1:
        buf = []
        for ts, gray, depth in frames:
            buf.append((gray, depth))
            n += 1
            if len(buf) == args.chunk:
                slam.process_chunk(
                    np.stack([g for g, _ in buf]), np.stack([d for _, d in buf])
                )
                buf.clear()
        if buf:  # tail < chunk: per-frame dispatches (no extra scan compile)
            for g, d in buf:
                slam.process_frame(g, d)
    else:
        for ts, gray, depth in frames:
            slam.process_frame(gray, depth)
            n += 1
    poses, rmses = slam.finalize()
    dt = time.perf_counter() - t0
    print(f"fused slam: {n} frames in {dt:.2f}s ({n / dt:.2f} fps), "
          f"{slam.num_active} blocks, overflow {slam.overflow}")
    traj.write_matrix_trajectory(args.out_traj, poses)
    if args.checkpoint:
        ckpt.save(slam, args.checkpoint)
        print(f"checkpoint -> {args.checkpoint}")
    if gt is not None:
        gt = np.asarray(gt)
        m = min(len(poses), len(gt))
        print(f"ATE RMSE (first {m} frames): {traj.ate_rmse(poses[:m], gt[:m]):.5f} m")

    t1 = time.perf_counter()
    vol = slam.to_volume()
    tv, tc = vol.extract_mesh()
    verts, faces, cols = dedup_triangle_soup(tv, tc)
    write_ply_mesh(args.out_mesh, verts, faces, colors=cols)
    print(f"mesh: {len(verts)} verts {len(faces)} faces in "
          f"{time.perf_counter() - t1:.2f}s -> {args.out_mesh}")
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
