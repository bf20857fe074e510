#!/usr/bin/env python
"""Synthetic bundle-adjustment convergence test (ref: example/BATest.cpp).

Generates a circular camera trajectory + random world points + noisy
projections (ref BATest.cpp:10-59), perturbs, optimises with full BA, and
prints per-iteration cost and final errors.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--points", type=int, default=200)
    ap.add_argument("--pixel-noise", type=float, default=0.5)
    ap.add_argument("--pose-noise", type=float, default=0.05)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", choices=["full", "posegraph"], default="full")
    args = ap.parse_args()

    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.optimization import bundle, posegraph

    rng = np.random.default_rng(0)
    fx = fy = 300.0
    cx, cy = 160.0, 120.0
    n = args.frames
    T_wc = []
    for i in range(n):
        ang = 2 * np.pi * i / n * 0.25
        eye = np.array([2 * np.sin(ang), 0.2 * np.sin(2 * ang), -2 * np.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        T = np.eye(4); T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, np.cross(fwd, right), fwd, eye
        T_wc.append(T)
    T_wc = np.array(T_wc)
    T_cw = np.linalg.inv(T_wc)
    pts = rng.uniform(-0.8, 0.8, size=(args.points, 3))

    if args.mode == "posegraph":
        edge_list = []
        for i, j in [(k, k + 1) for k in range(n - 1)] + [(0, n - 1)]:
            p_i = (T_cw[i] @ np.c_[pts, np.ones(len(pts))].T).T[:, :3]
            p_j = (T_cw[j] @ np.c_[pts, np.ones(len(pts))].T).T[:, :3]
            edge_list.append({"src": i, "dst": j, "p_src": p_i, "p_dst": p_j})
        edges = posegraph.build_edges(edge_list, corr_capacity=len(pts))
        noise = rng.normal(size=(n, 6)) * args.pose_noise
        noise[0] = 0
        init = np.einsum("nij,njk->nik", np.asarray(se3.se3_exp(jnp.asarray(noise, jnp.float32))), T_wc)
        opt, cost = posegraph.optimize_pose_graph(jnp.asarray(init, jnp.float32), edges, iters=10)
        err = np.abs(np.asarray(opt) - T_wc).max()
        print(f"posegraph: final cost {float(cost):.3e}, max pose err {err:.3e}")
        return

    frames, pids, uvs = [], [], []
    for f in range(n):
        pc = (T_cw[f] @ np.c_[pts, np.ones(len(pts))].T).T[:, :3]
        z = pc[:, 2]
        u = pc[:, 0] / z * fx + cx
        v = pc[:, 1] / z * fy + cy
        ok = (z > 0.3) & (u > 0) & (u < 2 * cx) & (v > 0) & (v < 2 * cy)
        for p in np.nonzero(ok)[0]:
            frames.append(f); pids.append(p)
            uvs.append([u[p] + rng.normal() * args.pixel_noise, v[p] + rng.normal() * args.pixel_noise])
    obs = bundle.build_observations(np.array(frames), np.array(pids), np.array(uvs, np.float32), args.points)
    pose_pert = rng.normal(size=(n, 6)) * args.pose_noise
    pose_pert[0] = 0
    init_poses = np.einsum("nij,njk->nik", np.asarray(se3.se3_exp(jnp.asarray(pose_pert, jnp.float32))), T_cw)
    init_points = pts + rng.normal(size=pts.shape) * 0.05
    problem = bundle.BAProblem(jnp.asarray(init_poses, jnp.float32), jnp.asarray(init_points, jnp.float32), obs)
    opt, mse = bundle.optimize(problem, fx, fy, cx, cy, max_iters=args.iters, verbose=True)
    print(f"final mean reprojection error: {np.sqrt(mse):.3f} px "
          f"(injected noise {args.pixel_noise} px), obs {len(frames)}")


if __name__ == "__main__":
    main()
