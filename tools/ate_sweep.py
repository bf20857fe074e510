"""Sweep exact-path formulation knobs vs the reference's measured ATE.

The reference (DenseOdometryFunction.cpp) differs from round-2's exact
path in: depth gate MAX_DIFF_DEPTH=0.05 (we had 0.07), Gaussian-blurred
depth (NaN-propagating), and NormalizeIntensity to mean 0.5. This sweep
isolates each knob's contribution on the bench orbit sequence.
Target: ate <= 1.83 mm (BASELINE_MEASURED.json ate_rmse_m_cpu).
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry.camera import TUM_CAMERA as cam
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.utils import synthetic

    n = 16
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(n)
    raw = []
    for i in range(n):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), cam.fx, cam.fy, cam.cx, cam.cy,
            cam.height, cam.width, num_steps=64,
        )
        raw.append((d, g))
    jax.block_until_ready(raw[-1])

    def run(name, pre_kw, track_kw):
        pyrs = [
            dense.preprocess_frame(g, d, cam, **pre_kw) for d, g in raw
        ]
        jax.block_until_ready(pyrs[-1])
        t0 = time.perf_counter()
        est = [np.eye(4, dtype=np.float32)]
        rel_r = []
        T_rel = jnp.eye(4)
        for i in range(1, n):
            res = dense.dense_tracking_exact(
                pyrs[i - 1], pyrs[i], cam, init_T=T_rel, **track_kw)
            T_rel = res.T_ts
            Tn = np.asarray(T_rel)
            est.append(est[-1] @ np.linalg.inv(Tn))
            gt_ts = np.linalg.inv(np.asarray(poses[i])) @ np.asarray(poses[i - 1])
            dd = np.linalg.inv(gt_ts) @ Tn
            rel_r.append(
                np.rad2deg(np.arccos(np.clip((np.trace(dd[:3, :3]) - 1) / 2, -1, 1)))
            )
        ate = traj.ate_rmse(np.stack(est), poses)
        print(
            f"{name:36s} ate={ate * 1000:7.2f} mm  rel_r mean={np.mean(rel_r):6.4f} deg"
            f"  ({time.perf_counter() - t0:.0f}s)", flush=True,
        )

    base_pre = dict(depth_blur=False, intensity_norm=False)
    run("A baseline (r02 exact)", base_pre, dict(depth_diff_max=0.07))
    run("B ddm=0.05", base_pre, dict(depth_diff_max=0.05))
    run("C B + depth blur",
        dict(depth_blur=True, intensity_norm=False), dict(depth_diff_max=0.05))
    run("D C + intensity norm",
        dict(depth_blur=True, intensity_norm=True), dict(depth_diff_max=0.05))
    run("E norm only",
        dict(depth_blur=False, intensity_norm=True), dict(depth_diff_max=0.05))
    run("F blur only ddm 0.07",
        dict(depth_blur=True, intensity_norm=False), dict(depth_diff_max=0.07))
    run("G C + masked zSobel",
        dict(depth_blur=True, intensity_norm=False), dict(depth_diff_max=0.05))
    run("H G + pair norm",
        dict(depth_blur=True, intensity_norm=False),
        dict(depth_diff_max=0.05, pair_norm=True))
    run("I H w/o depth blur",
        dict(depth_blur=False, intensity_norm=False),
        dict(depth_diff_max=0.05, pair_norm=True))


if __name__ == "__main__":
    main()
