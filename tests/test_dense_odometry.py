"""Dense odometry: recover known synthetic camera motion.

Mirrors the reference's verification style (run two frames, check the
transform — ref: example/DenseOdometry.cpp) but with analytic ground truth
from the SDF renderer, asserted numerically.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from onepiece_tpu.geometry import se3
from onepiece_tpu.geometry.camera import PinholeCamera
from onepiece_tpu.odometry import dense
from onepiece_tpu.utils import synthetic

# Small camera for CPU-speed tests
CAM = PinholeCamera(fx=80.0, fy=80.0, cx=79.5, cy=59.5, width=160, height=120, depth_scale=1000.0)


def render_pair(xi_delta):
    scene = synthetic.default_scene()
    T0 = jnp.eye(4)
    T1 = se3.se3_exp(jnp.asarray(xi_delta, jnp.float32))  # camera1-to-world
    frames = []
    for T in (T0, T1):
        d, g = synthetic.render(scene, T, CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.height, CAM.width)
        frames.append((d, g))
    return frames, T1


def pose_error(T_est, T_gt):
    delta = np.asarray(se3.se3_log(jnp.asarray(T_est) @ se3.inverse_T(jnp.asarray(T_gt))))
    return np.linalg.norm(delta[:3]), np.linalg.norm(delta[3:])


@pytest.mark.parametrize(
    "xi",
    [
        [0.02, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.015, -0.01, 0.0, 0.0, 0.0],
        [0.01, -0.01, 0.015, 0.01, -0.015, 0.008],
    ],
)
def test_dense_tracking_recovers_motion(xi):
    (f0, f1), T1 = render_pair(xi)
    src = dense.preprocess_frame(f0[1], f0[0], CAM)
    tgt = dense.preprocess_frame(f1[1], f1[0], CAM)
    T_ts_gt = se3.inverse_T(T1)
    for track in (dense.dense_tracking, dense.dense_tracking_exact):
        res = track(src, tgt, CAM)
        t_err, r_err = pose_error(res.T_ts, T_ts_gt)
        assert t_err < 0.006, (track.__name__, t_err, r_err)
        assert r_err < 0.005, (track.__name__, t_err, r_err)
        assert float(res.num_inliers) > 2000


def test_dense_tracking_identity():
    (f0, _), _ = render_pair([0, 0, 0, 0, 0, 0])
    src = dense.preprocess_frame(f0[1], f0[0], CAM)
    res = dense.dense_tracking(src, src, CAM)
    t_err, r_err = pose_error(res.T_ts, np.eye(4))
    assert t_err < 1e-4 and r_err < 1e-4


def test_dense_tracking_with_init():
    # larger motion succeeds when initialised near the solution
    xi = [0.05, 0.02, -0.03, 0.03, -0.04, 0.02]
    (f0, f1), T1 = render_pair(xi)
    src = dense.preprocess_frame(f0[1], f0[0], CAM)
    tgt = dense.preprocess_frame(f1[1], f1[0], CAM)
    T_init = se3.se3_exp(-jnp.asarray(xi, jnp.float32) * 0.8)
    res = dense.dense_tracking(src, tgt, CAM, init_T=T_init)
    t_err, r_err = pose_error(res.T_ts, se3.inverse_T(T1))
    assert t_err < 0.005 and r_err < 0.005


def test_photo_and_depth_terms():
    xi = [0.015, 0.0, 0.01, 0.0, 0.01, 0.0]
    (f0, f1), T1 = render_pair(xi)
    src = dense.preprocess_frame(f0[1], f0[0], CAM)
    tgt = dense.preprocess_frame(f1[1], f1[0], CAM)
    for term in ("photo", "depth"):
        res = dense.dense_tracking_exact(src, tgt, CAM, term=term)
        t_err, r_err = pose_error(res.T_ts, se3.inverse_T(T1))
        assert t_err < 0.01, (term, t_err)
        assert r_err < 0.01, (term, r_err)
