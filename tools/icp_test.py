#!/usr/bin/env python
"""Align two point clouds with ICP (ref: example/ICPTest.cpp).

Reads two PLY files (or generates a synthetic pair), runs point-to-point or
point-to-plane ICP, prints the transform and rmse, optionally writes the
aligned source cloud.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", nargs="?", default="")
    ap.add_argument("target", nargs="?", default="")
    ap.add_argument("--mode", choices=["point", "plane"], default="point")
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.geometry.pointcloud import PointCloud, estimate_normals
    from onepiece_tpu.io.ply import read_ply, write_ply_pointcloud
    from onepiece_tpu.registration import icp

    if args.synthetic or not args.source:
        rng = np.random.default_rng(0)
        xy = rng.uniform(-1, 1, size=(3000, 2))
        z = 0.3 * np.sin(2.5 * xy[:, 0]) + 0.2 * np.cos(3.1 * xy[:, 1])
        src_pts = np.c_[xy, z].astype(np.float32)
        T_gt = np.asarray(se3.se3_exp(jnp.asarray([0.05, -0.03, 0.04, 0.05, -0.04, 0.06], jnp.float32)))
        tgt_pts = src_pts @ T_gt[:3, :3].T + T_gt[:3, 3]
        print("synthetic pair; ground truth transform known")
    else:
        src_pts = read_ply(args.source)["vertices"]
        tgt_pts = read_ply(args.target)["vertices"]
        T_gt = None

    src = PointCloud.from_numpy(src_pts)
    tgt = PointCloud.from_numpy(tgt_pts)
    if args.mode == "plane":
        tgt = estimate_normals(tgt, k=16)
        res = icp.point_to_plane(
            src.points, src.valid, tgt.points, tgt.normals, tgt.valid,
            threshold=args.threshold, iters=args.iters,
        )
    else:
        res = icp.point_to_point(
            src.points, src.valid, tgt.points, tgt.valid,
            threshold=args.threshold, iters=args.iters,
        )
    T = np.asarray(res.T)
    print("T =\n", T)
    print(f"inliers {int(res.num_inliers)} rmse {float(res.rmse):.6f}")
    if T_gt is not None:
        print("max |T - T_gt| =", np.abs(T - T_gt).max())
    if args.out:
        aligned = src_pts @ T[:3, :3].T + T[:3, 3]
        write_ply_pointcloud(args.out, aligned)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
