#!/usr/bin/env python
"""Frame-to-frame dense RGB-D odometry over a sequence.

CLI rebuild of the reference's DenseOdometry example
(ref: example/DenseOdometry.cpp): tracks each frame against the previous,
chains global poses, writes trajectory.txt (16-float rows,
ref: DenseFusion.cpp:98-101) and reports ATE when ground truth exists.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    from _common import add_dataset_args, load_frames

    add_dataset_args(ap)
    ap.add_argument("--out", type=str, default="trajectory.txt")
    ap.add_argument("--init-prev", action="store_true", default=True,
                    help="initialise each frame with the previous relative pose")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.odometry import dense

    frames, cam, gt = load_frames(args)
    poses = [np.eye(4, dtype=np.float32)]
    prev_pyr = None
    prev_rel = jnp.eye(4)
    t0 = time.perf_counter()
    n = 0
    for ts, gray, depth in frames:
        pyr = dense.preprocess_frame(jnp.asarray(gray), jnp.asarray(depth), cam)
        if prev_pyr is not None:
            res = dense.dense_tracking(prev_pyr, pyr, cam, init_T=prev_rel)
            T_ts = np.asarray(res.T_ts)
            poses.append(poses[-1] @ np.linalg.inv(T_ts))
            prev_rel = res.T_ts
            print(f"frame {n}: rmse {float(res.rmse):.5f} inliers {int(res.num_inliers)}")
        prev_pyr = pyr
        n += 1
    jax.block_until_ready(prev_pyr)
    dt = time.perf_counter() - t0
    print(f"tracked {n} frames in {dt:.2f}s ({n / dt:.2f} fps)")

    traj.write_matrix_trajectory(args.out, np.stack(poses))
    print(f"wrote {args.out}")
    if gt is not None:
        ate = traj.ate_rmse(np.stack(poses), gt[: len(poses)])
        print(f"ATE RMSE: {ate:.5f} m")


if __name__ == "__main__":
    main()
