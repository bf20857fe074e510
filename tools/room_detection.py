#!/usr/bin/env python
"""RoomDetection: wall-line arrangement + diffusion-embedding room labels.

CLI rebuild of ref example/RoomDetection.cpp — detect wall lines from 2-D
wall evidence points (projected point cloud or synthetic floor plan), build
the DCEL arrangement, weight face adjacency by wall evidence, and cluster
faces into rooms via diffusion embedding + k-means.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default="", help="PLY cloud; walls projected to XY (default: synthetic 2-room plan)")
    ap.add_argument("--rooms", type=int, default=2)
    ap.add_argument("--z-min", type=float, default=0.3, help="wall band lower z")
    ap.add_argument("--z-max", type=float, default=2.0, help="wall band upper z")
    ap.add_argument("--wall-dist", type=float, default=0.1)
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.algorithm import dcel, rooms
    from onepiece_tpu.algorithm.patch_detection import detect_patches
    from onepiece_tpu.io.ply import read_ply
    from onepiece_tpu.ops.knn import knn

    rng = np.random.default_rng(0)
    if args.input:
        v = read_ply(args.input)["vertices"].astype(np.float32)
        band = v[(v[:, 2] > args.z_min) & (v[:, 2] < args.z_max)]
        wall_pts = band[:, :2]
        print(f"wall band: {len(wall_pts)} points")
    else:
        # synthetic: 4x2 outer box + dividing wall at x=0 with a door gap
        ys = rng.uniform(-1, 1, 400)
        wall_pts = np.concatenate([
            np.c_[np.zeros(300), rng.uniform(-1, 1, 300)],  # divider x=0
            np.c_[rng.uniform(-2, 2, 200), np.full(200, -1.0)],
            np.c_[rng.uniform(-2, 2, 200), np.full(200, 1.0)],
            np.c_[np.full(100, -2.0), rng.uniform(-1, 1, 100)],
            np.c_[np.full(100, 2.0), rng.uniform(-1, 1, 100)],
        ]).astype(np.float32)
        wall_pts += rng.normal(0, 0.01, wall_pts.shape).astype(np.float32)
        print("synthetic: 2-room floor plan, divider at x=0")

    # wall lines by 2-D region growing over the wall points
    sub = wall_pts[rng.choice(len(wall_pts), min(len(wall_pts), 1500), replace=False)]
    idx, _ = knn(jnp.asarray(sub), jnp.asarray(sub), jnp.ones(len(sub), bool), k=8)
    patches = detect_patches(
        sub, np.asarray(idx), residual_threshold=0.05, min_points=40
    )
    lines = []
    for p in patches:
        m = p.model  # (origin 2, dir 2) flat
        lines.append([m[0], m[1], m[2], m[3]])
    print(f"{len(lines)} wall lines detected")
    if not lines:
        print("no walls found"); return

    lo = wall_pts.min(0) - 0.2
    hi = wall_pts.max(0) + 0.2
    arr = dcel.build_arrangement(
        np.asarray(lines, float), box_lo=tuple(lo[:2]), box_hi=tuple(hi[:2])
    )
    print(f"arrangement: {len(arr.faces)} faces")
    labels = rooms.detect_rooms(arr, wall_pts, num_rooms=args.rooms, wall_dist=args.wall_dist)
    for r in np.unique(labels):
        areas = [i for i in range(len(labels)) if labels[i] == r]
        print(f"  room {r}: faces {areas}")
    print("PASS" if len(np.unique(labels)) == min(args.rooms, len(arr.faces)) else "WARN: fewer rooms than requested")


if __name__ == "__main__":
    main()
