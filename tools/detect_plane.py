#!/usr/bin/env python
"""DetectPlane: region-growing plane patches in a point cloud.

CLI rebuild of ref example/DetectPlane.cpp — kNN on device, greedy
region-growing plane detection (algorithm/patch_detection.py), write each
patch as a colored PLY segment.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default="", help="PLY cloud (default: synthetic 3-plane corner)")
    ap.add_argument("output", nargs="?", default="planes.ply")
    ap.add_argument("--knn", type=int, default=10)
    ap.add_argument("--residual", type=float, default=0.02)
    ap.add_argument("--min-points", type=int, default=50)
    ap.add_argument("--max-points", type=int, default=4000, help="random subsample cap")
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.algorithm.patch_detection import detect_patches
    from onepiece_tpu.io.ply import read_ply, write_ply_pointcloud
    from onepiece_tpu.ops.knn import knn

    rng = np.random.default_rng(0)
    if args.input:
        pts = read_ply(args.input)["vertices"].astype(np.float32)
    else:
        # synthetic room corner: 3 mutually perpendicular planes
        a = np.c_[rng.uniform(0, 2, (500, 2)), np.zeros(500)]  # floor z=0
        b = np.c_[rng.uniform(0, 2, 500), np.zeros(500), rng.uniform(0, 2, 500)]  # wall y=0
        c = np.c_[np.zeros(500), rng.uniform(0, 2, (500, 2))]  # wall x=0
        pts = np.concatenate([a, b, c]).astype(np.float32)
        pts += rng.normal(0, 0.003, pts.shape).astype(np.float32)
        print("synthetic: 3-plane corner, 1500 points")
    if len(pts) > args.max_points:
        pts = pts[rng.choice(len(pts), args.max_points, replace=False)]

    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), jnp.ones(len(pts), bool), k=args.knn)
    patches = detect_patches(
        pts, np.asarray(idx),
        residual_threshold=args.residual, min_points=args.min_points,
    )
    print(f"{len(patches)} plane patches over {len(pts)} points")
    tab = np.asarray(
        [[230, 25, 75], [60, 180, 75], [0, 130, 200], [255, 225, 25],
         [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230]],
        np.float32,
    ) / 255.0
    colors = np.full((len(pts), 3), 0.4, np.float32)
    for i, p in enumerate(patches):
        n = p.model[:3] / np.linalg.norm(p.model[:3])
        print(f"  patch {i}: {len(p.indices)} pts, normal=({n[0]:+.2f}, {n[1]:+.2f}, {n[2]:+.2f})")
        colors[np.asarray(p.indices)] = tab[i % len(tab)]
    write_ply_pointcloud(args.output, pts, colors=colors)
    print(f"labeled cloud -> {args.output}")


if __name__ == "__main__":
    main()
