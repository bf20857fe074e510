#!/usr/bin/env python
"""Clustering: k-means / mean-shift / k-medoids over a point cloud.

CLI rebuild of ref example/Clustering.cpp — cluster PLY points (or synthetic
Gaussian blobs) and write the labeled cloud as colored PLY.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default="", help="PLY point cloud (default: synthetic blobs)")
    ap.add_argument("output", nargs="?", default="clusters.ply")
    ap.add_argument("--method", choices=["kmeans", "meanshift", "kmedoids"], default="kmeans")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--bandwidth", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepiece_tpu.algorithm import clustering
    from onepiece_tpu.io.ply import read_ply, write_ply_pointcloud

    if args.input:
        pts = read_ply(args.input)["vertices"].astype(np.float32)
    else:
        rng = np.random.default_rng(args.seed)
        centers = rng.uniform(-2, 2, (args.k, 3))
        pts = np.concatenate(
            [c + rng.normal(0, 0.15, (300, 3)) for c in centers]
        ).astype(np.float32)
        print(f"synthetic: {args.k} blobs x 300 points")

    n = len(pts)
    valid = jnp.ones(n, bool)
    jp = jnp.asarray(pts)
    key = jax.random.PRNGKey(args.seed)
    if args.method == "kmeans":
        _, labels = clustering.kmeans(key, jp, valid, k=args.k)
        labels = np.asarray(labels)
    elif args.method == "kmedoids":
        _, labels = clustering.kmedoids(key, jp, valid, k=args.k)
        labels = np.asarray(labels)
    else:
        _, labels = clustering.mean_shift_clusters(jp, valid, bandwidth=args.bandwidth)
        labels = np.asarray(labels)

    uniq = np.unique(labels[labels >= 0])
    print(f"{args.method}: {len(uniq)} clusters over {n} points")
    for u in uniq[:10]:
        print(f"  cluster {u}: {(labels == u).sum()} points")

    tab = np.asarray(
        [[230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
         [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230]],
        np.float32,
    ) / 255.0
    colors = tab[np.maximum(labels, 0) % len(tab)]
    write_ply_pointcloud(args.output, pts, colors=colors)
    print(f"labeled cloud -> {args.output}")


if __name__ == "__main__":
    main()
