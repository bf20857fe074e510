"""Sensor-corruption robustness: the production systems must keep
tracking on depth-noised/holed/gray-noised input (the scene every
BENCH noisy_* extra runs at full resolution; VERDICT r4 weak #8).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from onepiece_tpu.geometry.camera import TUM_CAMERA
from onepiece_tpu.io import trajectory as traj
from onepiece_tpu.utils import synthetic

CAM = TUM_CAMERA.next_pyramid_level().next_pyramid_level()  # 160x120


@pytest.fixture(scope="module")
def noisy_seq12():
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(12)
    grays, depths = [], []
    for i in range(12):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
            CAM.height, CAM.width, num_steps=64,
        )
        grays.append(np.asarray(g))
        depths.append(np.asarray(d))
    gn, dn = synthetic.corrupt_sequence(
        np.stack(grays), np.stack(depths), holes=4, hole_radius=(2, 8)
    )
    return gn, dn, poses


def test_corruption_model_properties():
    """The sensor model does what it claims: depth noise grows with z,
    holes zero depth, determinism per seed."""
    rng = np.random.default_rng(0)
    z = np.full((64, 64), 3.0, np.float32)
    g = np.full((64, 64), 0.5, np.float32)
    g1, z1 = synthetic.corrupt_rgbd(np.random.default_rng(5), g, z)
    g2, z2 = synthetic.corrupt_rgbd(np.random.default_rng(5), g, z)
    np.testing.assert_array_equal(z1, z2)  # deterministic
    assert (z1 == 0).sum() > 0  # holes punched
    far_sigma = np.std(z1[z1 > 0] - 3.0)
    znear = np.full((64, 64), 0.6, np.float32)
    _, z3 = synthetic.corrupt_rgbd(np.random.default_rng(7), g, znear, holes=0)
    near_sigma = np.std(z3 - 0.6)
    assert far_sigma > 3 * near_sigma  # quadratic growth with depth
    del rng


def test_dense_tracks_through_corruption(noisy_seq12):
    from onepiece_tpu.systems.fused_slam import FusedDenseFusion

    gn, dn, poses = noisy_seq12
    slam = FusedDenseFusion(
        CAM, capacity=8192, table_size=1 << 14, kmax=2048, stride=2,
        interpret=True, radii=(4, 3, 2),
    )
    slam.process_chunk(gn[:6], dn[:6])
    slam.process_chunk(gn[6:], dn[6:])
    est, _ = slam.finalize()
    ate = traj.ate_rmse(est, poses)
    assert ate < 0.03, ate


def test_sparse_tracks_through_corruption(noisy_seq12):
    from onepiece_tpu.systems.fused_ba import FusedBASlam

    gn, dn, poses = noisy_seq12
    slam = FusedBASlam(
        CAM, max_keypoints=500, keyframe_disparity=10.0,
        pt_capacity=2048, obs_capacity=4096, ba_iters=4,
    )
    slam.process_chunk(gn, dn)
    est = slam.trajectory()
    ate = traj.ate_rmse(est, poses)
    # corruption triples the reference's full-res sparse ATE
    # (BASELINE_MEASURED noisy_*); at quarter resolution the same noise is
    # relatively harsher — the gate asserts tracking SURVIVES with bounded
    # drift, not clean-scene accuracy
    assert ate < 0.12, ate
    assert slam.num_kf >= 3
