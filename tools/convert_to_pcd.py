#!/usr/bin/env python
"""Convert an RGB-D sequence to posed point clouds / a fused cloud PLY.

CLI rebuild of ref example/ConvertImageSequenceToPCD.cpp.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--out", default="cloud.ply")
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--voxel", type=float, default=0.02)
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.geometry.pointcloud import PointCloud, compact, merge, voxel_downsample
    from onepiece_tpu.io.ply import write_ply_pointcloud

    frames, cam, gt = load_frames(args)
    fused = None
    for i, (ts, gray, depth) in enumerate(frames):
        if i % args.stride:
            continue
        cloud = PointCloud.from_rgbd(jnp.asarray(depth), jnp.stack([jnp.asarray(gray)] * 3, -1), cam)
        if gt is not None and i < len(gt):
            cloud = cloud.transform(jnp.asarray(gt[i], jnp.float32))
        fused = cloud if fused is None else merge(fused, cloud)
    ds = compact(voxel_downsample(fused, args.voxel, out_capacity=fused.capacity))
    pts, nrm, cols = ds.to_numpy()
    write_ply_pointcloud(args.out, pts, colors=cols)
    print(f"wrote {len(pts)} points -> {args.out}")


if __name__ == "__main__":
    main()
