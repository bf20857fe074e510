#!/usr/bin/env python
"""Sparse (ORB-style) odometry over a sequence.

CLI rebuild of ref example/SparseOdometry.cpp / SparseOdometryMild.cpp:
tracks each frame against the previous with the feature front end +
batched RANSAC, writes the trajectory, reports ATE.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--out", type=str, default="trajectory_sparse.txt")
    ap.add_argument("--fast-threshold", type=float, default=0.01)  # matches fba_fusion; 0.05 starves low-contrast scenes
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.odometry import sparse

    frames, cam, gt = load_frames(args)
    poses = [np.eye(4, dtype=np.float32)]
    prev = None
    t0 = time.perf_counter()
    n = 0
    fails = 0
    for ts, gray, depth in frames:
        f = sparse.extract_sparse_frame(
            jnp.asarray(gray), jnp.asarray(depth), cam, threshold=args.fast_threshold
        )
        if prev is not None:
            res = sparse.sparse_tracking(prev, f, cam)
            if bool(res.success):
                poses.append(poses[-1] @ np.linalg.inv(np.asarray(res.T_ts)))
            else:
                poses.append(poses[-1].copy())
                fails += 1
            print(f"frame {n}: inliers {int(res.num_inliers)} rmse {float(res.rmse):.4f} ok={bool(res.success)}")
        prev = f
        n += 1
    dt = time.perf_counter() - t0
    print(f"tracked {n} frames in {dt:.2f}s ({n / dt:.2f} fps), {fails} failures")
    traj.write_matrix_trajectory(args.out, np.stack(poses))
    if gt is not None:
        print(f"ATE RMSE: {traj.ate_rmse(np.stack(poses), gt[: len(poses)]):.5f} m")


if __name__ == "__main__":
    main()
