"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline (per BASELINE.json): frames/s/chip for the dense RGB-D
odometry + TSDF fusion pipeline at 640x480, with ATE RMSE against the
synthetic sequence's analytic ground-truth trajectory (no public datasets
exist in this environment; the SDF renderer provides exact GT).

vs_baseline divides by the reference CPU pipeline's throughput measured on
this same machine (BASELINE_MEASURED.json, produced by bench_reference/ —
the reference's own C++ sources compiled headless and run on the same
synthetic dataset).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _baseline() -> dict:
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.geometry.camera import TUM_CAMERA
    from onepiece_tpu.integration.blocks import TSDFVolume
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.ops.image import bilateral_filter
    from onepiece_tpu.utils import synthetic

    cam = TUM_CAMERA
    n_frames = 16
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(n_frames)
    frames = []
    for i in range(n_frames):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), cam.fx, cam.fy, cam.cx, cam.cy,
            cam.height, cam.width, num_steps=64,
        )
        frames.append((d, g))
    jax.block_until_ready(frames[-1])

    vol = TSDFVolume(voxel_size=0.0125, truncation=0.1, capacity=8192)

    def step(prev_pyr, pyr, prev_rel, depth, gray, pose_world):
        res = dense.dense_tracking(prev_pyr, pyr, cam, init_T=prev_rel)
        d_f = bilateral_filter(depth)
        rgb = jnp.stack([gray, gray, gray], -1)
        vol.integrate(d_f, rgb, pose_world, cam)
        return res

    # warmup/compile: run two frames through the full pipeline
    pyr0 = dense.preprocess_frame(frames[0][1], frames[0][0], cam)
    pyr1 = dense.preprocess_frame(frames[1][1], frames[1][0], cam)
    res = step(pyr0, pyr1, jnp.eye(4), frames[1][0], frames[1][1], jnp.eye(4))
    jax.block_until_ready(res)
    # rebuild the volume so timing starts clean (but compiled)
    vol = TSDFVolume(voxel_size=0.0125, truncation=0.1, capacity=8192)

    # timed: full per-frame pipeline — preprocess + tracking + TSDF fuse
    t0 = time.perf_counter()
    est_poses = [np.eye(4, dtype=np.float32)]
    prev_rel = jnp.eye(4)
    prev_pyr = dense.preprocess_frame(frames[0][1], frames[0][0], cam)
    t_track = 0.0
    for i in range(1, n_frames):
        d, g = frames[i]
        pyr = dense.preprocess_frame(g, d, cam)
        tt = time.perf_counter()
        res = dense.dense_tracking(prev_pyr, pyr, cam, init_T=prev_rel)
        jax.block_until_ready(res.T_ts)
        t_track += time.perf_counter() - tt
        T_world = est_poses[-1] @ np.asarray(se3.inverse_T(res.T_ts))
        est_poses.append(T_world)
        d_f = bilateral_filter(d)
        vol.integrate(d_f, jnp.stack([g, g, g], -1), jnp.asarray(T_world), cam)
        prev_pyr = pyr
        prev_rel = res.T_ts
    jax.block_until_ready(vol.sdf)
    dt = time.perf_counter() - t0
    fps = (n_frames - 1) / dt

    from onepiece_tpu.io import trajectory as traj

    ate = traj.ate_rmse(np.stack(est_poses), poses)
    base = _baseline()
    base_fps = float(base.get("dense_odometry_tsdf_fps_cpu", 1.0))
    print(
        json.dumps(
            {
                "metric": "dense_odometry_tsdf_fps_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / base_fps, 3),
                "extra": {
                    "ate_rmse_m": round(ate, 5),
                    "tracking_ms_per_frame": round(t_track / (n_frames - 1) * 1e3, 2),
                    "frames": n_frames,
                    "resolution": "640x480",
                    "active_blocks": vol.num_active,
                    "baseline_fps_cpu": base_fps,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
