#!/usr/bin/env python
"""RansacTest: synthetic exercises of the batched RANSAC engines.

CLI rebuild of ref example/RansacTest.cpp — generate noisy correspondences
with outliers, fit a rigid transform (RANSAC3d equivalent) and a plane, and
report recovered models vs ground truth.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=400)
    ap.add_argument("--outlier-ratio", type=float, default=0.4)
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--num-hypotheses", type=int, default=512)
    ap.add_argument("--threshold", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.ops.ransac import ransac_plane, ransac_rigid

    rng = np.random.default_rng(args.seed)
    n = args.n_points

    # --- rigid transform with outliers (ref RansacTest rigid mode) --------
    src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    xi = np.array([0.1, -0.2, 0.15, 0.2, -0.1, 0.3], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    dst = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    dst += rng.normal(0, args.noise, dst.shape).astype(np.float32)
    n_out = int(n * args.outlier_ratio)
    dst[:n_out] = rng.uniform(-2, 2, (n_out, 3))

    res = ransac_rigid(
        jax.random.PRNGKey(args.seed), jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(n, bool), num_hypotheses=args.num_hypotheses,
        threshold=args.threshold,
    )
    T_est = np.asarray(res.T)
    rot_err = np.rad2deg(
        np.arccos(np.clip((np.trace(T_est[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1))
    )
    t_err = np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
    print(f"rigid:  inliers={int(res.num_inliers)}/{n} "
          f"rot_err={rot_err:.3f} deg  t_err={t_err * 1000:.2f} mm")
    assert rot_err < 1.0 and t_err < 0.02, "rigid RANSAC failed to recover pose"

    # --- plane fit with outliers (ref RansacTest / FitPlaneRANSAC) --------
    npl = n
    pts = np.zeros((npl, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, (npl, 2))
    nrm = np.array([0.2, -0.3, 0.93])
    nrm /= np.linalg.norm(nrm)
    d0 = 0.4
    # z s.t. n . p + d0 = 0 for inliers
    pts[:, 2] = -(pts[:, 0] * nrm[0] + pts[:, 1] * nrm[1] + d0) / nrm[2]
    pts += rng.normal(0, args.noise, pts.shape).astype(np.float32)
    pts[:n_out] = rng.uniform(-2, 2, (n_out, 3))

    plane, inl = ransac_plane(
        jax.random.PRNGKey(args.seed + 1), jnp.asarray(pts),
        jnp.ones(npl, bool), num_hypotheses=args.num_hypotheses,
        threshold=args.threshold,
    )
    model = np.asarray(plane)
    nr = model[:3] / np.linalg.norm(model[:3])
    ang = np.rad2deg(np.arccos(np.clip(abs(nr @ nrm), -1, 1)))
    print(f"plane:  inliers={int(np.asarray(inl).sum())}/{npl} normal_err={ang:.3f} deg")
    assert ang < 2.0, "plane RANSAC failed to recover normal"
    print("PASS")


if __name__ == "__main__":
    main()
