"""Probe the fixed-point bias of the dense-tracking objectives.

Initialise a single frame pair AT the ground-truth relative pose and watch
where each objective's GN iterations drift: an unbiased objective stays at
GT (the global minimum of the true alignment problem for synthetic data).
Splits by term (photo-only / depth-only / hybrid) and by path
(fast stencil / exact bilinear).
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from onepiece_tpu.geometry.camera import TUM_CAMERA as cam
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.utils import synthetic

    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(16)
    i = 7
    d0, g0 = synthetic.render(scene, jnp.asarray(poses[i]), cam.fx, cam.fy,
                              cam.cx, cam.cy, cam.height, cam.width, num_steps=64)
    d1, g1 = synthetic.render(scene, jnp.asarray(poses[i + 1]), cam.fx, cam.fy,
                              cam.cx, cam.cy, cam.height, cam.width, num_steps=64)
    src = dense.preprocess_frame(g0, d0, cam)
    tgt = dense.preprocess_frame(g1, d1, cam)
    T_gt = jnp.asarray(
        np.linalg.inv(np.asarray(poses[i + 1])) @ np.asarray(poses[i]),
        jnp.float32,
    )

    def drift(name, fn):
        T = np.asarray(fn())
        d = np.linalg.inv(np.asarray(T_gt)) @ T
        dt = np.linalg.norm(d[:3, 3]) * 1000
        dr = np.rad2deg(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
        print(f"{name:44s} drift t={dt:7.2f} mm  r={dr:7.4f} deg")

    # fast path from GT: only the finest level runs (iters 0 at others)
    for lam, tag in ((0.5, "hybrid"), (0.0, "photo"), (1.0, "depth")):
        drift(f"fast finest-only from GT ({tag})", lambda lam=lam: dense.dense_tracking(
            src, tgt, cam, init_T=T_gt, iters=(0, 0, 8), radii=(4, 3, 4),
            lambda_depth=lam, polish=0).T_ts)
    for lam, tag in ((0.5, "hybrid"), (0.0, "photo"), (1.0, "depth")):
        drift(f"exact finest-only from GT ({tag})", lambda lam=lam: dense.dense_tracking_exact(
            src, tgt, cam, init_T=T_gt, iters=(0, 0, 8),
            lambda_depth=lam).T_ts)


if __name__ == "__main__":
    main()
