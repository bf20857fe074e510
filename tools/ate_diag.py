"""Diagnose dense-tracking accuracy vs GT on the bench orbit sequence.

Compares per-pair relative-pose error and end-to-end ATE for:
  - fast pre-warp+stencil path at radii (4,3,2) (bench config)
  - fast path at radii (8,4,4)
  - reference-exact bilinear-gather path (dense_tracking_exact)
against the analytic GT of the synthetic renderer.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.geometry.camera import TUM_CAMERA as cam
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.utils import synthetic

    n = 16
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(n)
    pyrs = []
    for i in range(n):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), cam.fx, cam.fy, cam.cx, cam.cy,
            cam.height, cam.width, num_steps=64,
        )
        pyrs.append(dense.preprocess_frame(g, d, cam))
    jax.block_until_ready(pyrs[-1])

    def run(name, track_fn):
        t0 = time.perf_counter()
        est = [np.eye(4, dtype=np.float32)]
        rel_err_t = []
        rel_err_r = []
        T_rel = jnp.eye(4)
        for i in range(1, n):
            res = track_fn(pyrs[i - 1], pyrs[i], T_rel)
            T_rel = res.T_ts
            Tn = np.asarray(T_rel)
            est.append(est[-1] @ np.linalg.inv(Tn))
            # our T_ts maps source->target camera: gt equivalent
            gt_ts = np.linalg.inv(np.asarray(poses[i])) @ np.asarray(poses[i - 1])
            d = np.linalg.inv(gt_ts) @ Tn
            rel_err_t.append(np.linalg.norm(d[:3, 3]))
            rel_err_r.append(
                np.rad2deg(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
            )
        ate = traj.ate_rmse(np.stack(est), poses)
        print(
            f"{name:28s} ate={ate * 1000:7.2f} mm  "
            f"rel_t mean={np.mean(rel_err_t) * 1000:6.2f} max={np.max(rel_err_t) * 1000:6.2f} mm  "
            f"rel_r mean={np.mean(rel_err_r):6.4f} deg  ({time.perf_counter() - t0:.1f}s)"
        )

    def two_round(a, b, T):
        r1 = dense.dense_tracking(
            a, b, cam, init_T=T, iters=(16, 4, 2), radii=(4, 3, 2), polish=0)
        return dense.dense_tracking(
            a, b, cam, init_T=r1.T_ts, iters=(0, 4, 2), radii=(4, 3, 2),
            polish=0)

    def three_round(a, b, T):
        r1 = dense.dense_tracking(
            a, b, cam, init_T=T, iters=(16, 4, 2), radii=(4, 3, 2), polish=0)
        r2 = dense.dense_tracking(
            a, b, cam, init_T=r1.T_ts, iters=(0, 4, 2), radii=(4, 3, 2),
            polish=0)
        return dense.dense_tracking(
            a, b, cam, init_T=r2.T_ts, iters=(0, 0, 2), radii=(4, 3, 2),
            polish=0)

    run("fast (4,3,2) 1-round", lambda a, b, T: dense.dense_tracking(
        a, b, cam, init_T=T, radii=(4, 3, 2), polish=0))
    run("fast 2-round re-prewarp", two_round)
    run("fast 3-round re-prewarp", three_round)
    run("exact bilinear", lambda a, b, T: dense.dense_tracking_exact(
        a, b, cam, init_T=T))


if __name__ == "__main__":
    main()
