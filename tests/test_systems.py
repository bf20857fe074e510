"""End-to-end SLAM systems on short synthetic sequences with GT ATE bounds."""

import jax.numpy as jnp
import numpy as np
import pytest

from onepiece_tpu.geometry.camera import PinholeCamera
from onepiece_tpu.io import trajectory as traj
from onepiece_tpu.systems.dense_slam import DenseSlam
from onepiece_tpu.systems.fbaslam import FBASlam
from onepiece_tpu.utils import synthetic

CAM = PinholeCamera(fx=100.0, fy=100.0, cx=79.5, cy=59.5, width=160, height=120, depth_scale=1000.0)


def render_seq(n):
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(n)
    out = []
    for i in range(n):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
            CAM.height, CAM.width, num_steps=64,
        )
        out.append((np.asarray(g), np.asarray(d)))
    return out, poses


@pytest.mark.slow
def test_dense_slam_short_sequence():
    frames, gt = render_seq(12)
    slam = DenseSlam(CAM, submap_size=6)
    for g, d in frames:
        slam.update_frame(g, d)
    est = slam.trajectory()
    assert est.shape == (12, 4, 4)
    ate = traj.ate_rmse(est, gt)
    assert ate < 0.01, ate
    # submaps created and registered
    assert len(slam.submap_poses) == 2
    assert any(m.get("icp_ok") for m in slam.metrics if "icp_ok" in m)


def test_fba_slam_short_sequence():
    frames, gt = render_seq(14)
    slam = FBASlam(CAM, fast_threshold=0.03, keyframe_disparity=10.0)
    for g, d in frames:
        info = slam.update_frame(g, d)
        assert info["success"], info
    est = slam.trajectory()
    ate = traj.ate_rmse(est, gt)
    # sparse 3D-3D at 160x120 is pixel-quantisation limited (~cm scale)
    assert ate < 0.06, ate
    assert len(slam.keyframe_frames) >= 2
    assert len(slam.edges) >= len(slam.keyframe_frames) - 1


def test_ba_slam_short_sequence():
    from onepiece_tpu.systems.baslam import BASlam

    frames, gt = render_seq(14)
    slam = BASlam(CAM, fast_threshold=0.03, keyframe_disparity=10.0)
    for g, d in frames:
        info = slam.update_frame(g, d)
        assert info["success"], info
    est = slam.trajectory()
    ate = traj.ate_rmse(est, gt)
    # 2D-reprojection BA (like the reference's BundleAdjustment) cannot fix
    # the scale drift of the pixel-quantised sparse odometry chain at this
    # tiny test resolution; the bound reflects the odometry floor.
    assert ate < 0.15, ate
    assert len(slam.world_points) > 20
    # BA ran and produced a finite reprojection error
    mse = slam.optimize()
    assert mse is None or mse < 25.0, mse


def test_ba_slam_link_tracks_colocated_keypoints():
    """Two dst keypoints at the SAME 3D position must link unambiguously:
    the match index is carried through the tracking result (corr_idx), not
    recovered by nearest-3D search (which would pick arbitrarily)."""
    import types

    import jax.numpy as jnp

    from onepiece_tpu.odometry import sparse as sp
    from onepiece_tpu.systems.baslam import BASlam

    slam = BASlam(CAM, max_keypoints=4)
    K = 4
    uv_src = np.array([[10, 10], [20, 20], [30, 30], [40, 40]], np.float32)
    # dst keypoints 1 and 2 share an identical 3D point
    pts_dst = np.array(
        [[0.1, 0.1, 1.0], [0.5, 0.5, 2.0], [0.5, 0.5, 2.0], [0.9, 0.1, 1.5]],
        np.float32,
    )
    uv_dst = np.array([[11, 10], [21, 20], [22, 21], [41, 40]], np.float32)
    pts_src = pts_dst.copy()

    def fake_frame(uv, pts):
        kp = types.SimpleNamespace(
            uv=jnp.asarray(uv), desc=jnp.zeros((K, 8), jnp.uint32),
            valid=jnp.ones(K, bool),
        )
        return sp.SparseFrame(kp, jnp.asarray(pts), jnp.ones(K, bool))

    slam.keyframe_frames = [fake_frame(uv_src, pts_src), fake_frame(uv_dst, pts_dst)]
    slam.keyframe_poses = [np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)]
    slam.track_of_kp = [np.full(K, -1, np.int64), np.full(K, -1, np.int64)]

    res = sp.SparseTrackingResult(
        T_ts=jnp.eye(4), num_inliers=jnp.int32(4), rmse=jnp.float32(0.0),
        success=jnp.bool_(True), corr_src=jnp.asarray(pts_src),
        corr_dst=jnp.asarray(pts_dst), corr_valid=jnp.ones(K, bool),
        corr_idx=jnp.asarray([0, 2, 1, 3]),  # src 1 -> dst 2, src 2 -> dst 1
    )
    linked = slam._link_tracks(0, 1, res)
    assert linked == 4
    src_tracks = slam.track_of_kp[0]
    dst_tracks = slam.track_of_kp[1]
    # src kp 1 must share a track with dst kp 2 (its true match), not dst 1
    assert src_tracks[1] == dst_tracks[2]
    assert src_tracks[2] == dst_tracks[1]
    assert len(set(src_tracks.tolist())) == 4  # four distinct world points


def test_fba_slam_process_chunk():
    """Chunked FBA (on-device keyframe-selection scan + batched LC) matches
    the per-frame API's quality envelope on the same sequence."""
    frames, gt = render_seq(14)
    slam = FBASlam(CAM, fast_threshold=0.03, keyframe_disparity=10.0)
    grays = np.stack([g for g, _ in frames])
    depths = np.stack([d for _, d in frames])
    slam.process_chunk(grays, depths)
    est = slam.trajectory()
    assert est.shape == (14, 4, 4)
    ate = traj.ate_rmse(est, gt)
    assert ate < 0.06, ate
    assert len(slam.keyframe_frames) >= 2
    assert len(slam.edges) >= len(slam.keyframe_frames) - 1
    # chunk can be split arbitrarily: state carries across chunk boundaries
    slam2 = FBASlam(CAM, fast_threshold=0.03, keyframe_disparity=10.0)
    slam2.process_chunk(grays[:7], depths[:7])
    slam2.process_chunk(grays[7:], depths[7:])
    est2 = slam2.trajectory()
    assert est2.shape == (14, 4, 4)
    assert traj.ate_rmse(est2, gt) < 0.06


@pytest.mark.slow
def test_long_loop_sequence_lc_and_pool_growth():
    """Long-sequence robustness at test scale: a CLOSED 96-frame loop.

    Asserts the three long-run behaviours the 16-frame bench cannot see:
    loop-closure edges fire on the return leg, the pose graph keeps the
    looped trajectory bounded, and the fused pool grows under pressure
    without dropping blocks. (Full-scale 200-frame run: tools/long_run.py,
    artifact LONGRUN.json.)
    """
    from onepiece_tpu.systems.fused_slam import FusedDenseFusion

    n = 96
    scene = synthetic.default_scene()
    poses = synthetic.loop_trajectory(n)
    grays, depths = [], []
    for i in range(n):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
            CAM.height, CAM.width, num_steps=48,
        )
        grays.append(np.asarray(g))
        depths.append(np.asarray(d))
    grays = np.stack(grays)
    depths = np.stack(depths)

    fba = FBASlam(CAM, fast_threshold=0.03, keyframe_disparity=10.0)
    for s in range(0, n, 24):
        fba.process_chunk(grays[s : s + 24], depths[s : s + 24])
    loop_edges = sum(1 for e in fba.edges if e["dst"] - e["src"] > 1)
    assert loop_edges >= 1, "no loop-closure edge fired on a closed loop"
    ate = traj.ate_rmse(fba.trajectory(), poses)
    assert ate < 0.05, ate

    # fused pool growth under occupancy pressure: the 0.5 threshold makes
    # maybe_grow re-allocate after the first chunk; the pool must keep
    # integrating correctly through the re-allocation with zero drops
    slam = FusedDenseFusion(
        CAM, voxel_size=0.03, truncation=0.12, capacity=1024,
        table_size=1 << 12, kmax=2048, stride=2, interpret=True,
    )
    grew = 0
    active_at_growth = 0
    for s in range(0, 8, 2):
        slam.process_chunk(grays[s : s + 2], depths[s : s + 2])
        if slam.maybe_grow(threshold=0.4):
            grew += 1
            active_at_growth = slam.num_active
    assert grew >= 1, "pool never grew"
    assert slam.capacity >= 2048
    assert slam.overflow == 0, f"blocks dropped: {slam.overflow}"
    # integration continued after the re-allocation
    assert slam.num_active > active_at_growth


def test_ba_slam_process_chunk():
    """Chunked BAFusion: on-device keyframe scan + track linking + full BA."""
    from onepiece_tpu.systems.baslam import BASlam

    frames, gt = render_seq(14)
    slam = BASlam(CAM, fast_threshold=0.03, keyframe_disparity=10.0)
    grays = np.stack([g for g, _ in frames])
    depths = np.stack([d for _, d in frames])
    slam.process_chunk(grays[:7], depths[:7])
    slam.process_chunk(grays[7:], depths[7:])
    est = slam.trajectory()
    assert est.shape == (14, 4, 4)
    ate = traj.ate_rmse(est, gt)
    assert ate < 0.06, ate
    assert len(slam.keyframe_frames) >= 2
    assert len(slam.world_points) >= 8
    assert len(slam.observations) >= 16
