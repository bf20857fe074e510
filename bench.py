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

    from onepiece_tpu.systems.pipeline import PipelinedDenseFusion

    # warmup/compile: run the full pipeline once
    warm = PipelinedDenseFusion(cam, volume_capacity=8192)
    for d, g in frames[:3]:
        warm.process_frame(g, d)
    warm.finalize()

    # timed: software-pipelined per-frame loop (one fused device program +
    # async transfers + one-frame-lagged TSDF integration)
    slam = PipelinedDenseFusion(cam, volume_capacity=8192)
    t0 = time.perf_counter()
    for d, g in frames:
        slam.process_frame(g, d)
    est_poses, rmses = slam.finalize()
    jax.block_until_ready(slam.volume.sdf)
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    vol = slam.volume
    t_track = dt / n_frames  # pipeline is fused; per-stage split not observable

    from onepiece_tpu.io import trajectory as traj

    ate = traj.ate_rmse(est_poses, poses)
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
