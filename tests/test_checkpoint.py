"""Full-SLAM-state checkpoint/resume (utils/checkpoint.py): a run that
checkpoints at frame N and resumes in a fresh instance must produce the
SAME trajectory as the uninterrupted run (VERDICT r3 missing #1; the
reference only serialises the TSDF volume, ref: CubeHandler.h:40-128)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onepiece_tpu.geometry.camera import TUM_CAMERA
from onepiece_tpu.utils import checkpoint, synthetic

CAM = TUM_CAMERA.next_pyramid_level().next_pyramid_level()  # 160x120


@pytest.fixture(scope="module")
def seq():
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
    return np.stack(grays), np.stack(depths), poses


@pytest.mark.slow
def test_dense_checkpoint_resume(seq, tmp_path):
    from onepiece_tpu.systems.fused_slam import FusedDenseFusion

    grays, depths, _ = seq
    kw = dict(capacity=2048, table_size=1 << 13, kmax=1024, interpret=True)

    # uninterrupted run
    ref = FusedDenseFusion(CAM, **kw)
    ref.process_chunk(grays[:6], depths[:6])
    ref.process_chunk(grays[6:], depths[6:])
    ref_poses, ref_rmses = ref.finalize()

    # checkpointed run: 6 frames -> save -> fresh instance -> 6 more
    a = FusedDenseFusion(CAM, **kw)
    a.process_chunk(grays[:6], depths[:6])
    path = str(tmp_path / "dense.npz")
    checkpoint.save(a, path)
    b = checkpoint.load(path, CAM)
    assert b.frame_count == 6
    b.process_chunk(grays[6:], depths[6:])
    b_poses, b_rmses = b.finalize()

    np.testing.assert_allclose(b_poses, ref_poses, atol=1e-6)
    assert b.num_active == ref.num_active
    # the voxel pool itself resumed bit-identically
    np.testing.assert_array_equal(
        np.asarray(b._state.vox), np.asarray(ref._state.vox)
    )


def test_sparse_checkpoint_resume(seq, tmp_path):
    from onepiece_tpu.systems.fused_sparse import FusedFBASlam

    grays, depths, _ = seq
    kw = dict(max_keypoints=500, keyframe_disparity=10.0)

    ref = FusedFBASlam(CAM, **kw)
    ref.process_chunk(grays[:6], depths[:6])
    ref.process_chunk(grays[6:], depths[6:])
    ref_traj = ref.trajectory()

    a = FusedFBASlam(CAM, **kw)
    a.process_chunk(grays[:6], depths[:6])
    path = str(tmp_path / "sparse.npz")
    checkpoint.save(a, path)
    b = checkpoint.load(path, CAM)
    assert b.frame_count == 6
    assert b.num_kf == a.num_kf
    b.process_chunk(grays[6:], depths[6:])
    b_traj = b.trajectory()

    np.testing.assert_allclose(b_traj, ref_traj, atol=1e-6)
    assert b.num_kf == ref.num_kf
    assert b.num_edges == ref.num_edges


def test_sparse_checkpoint_after_capacity_growth(seq, tmp_path):
    """Checkpoints taken AFTER the device arrays grew must restore the grown
    capacities and keep producing the uninterrupted trajectory."""
    from onepiece_tpu.systems.fused_sparse import FusedFBASlam

    grays, depths, _ = seq
    kw = dict(max_keypoints=500, keyframe_disparity=1e-6,  # every frame a KF
              kf_capacity=8, edge_capacity=16)

    ref = FusedFBASlam(CAM, **kw)
    ref.process_chunk(grays[:6], depths[:6])
    ref.process_chunk(grays[6:], depths[6:])

    a = FusedFBASlam(CAM, **kw)
    a.process_chunk(grays[:6], depths[:6])
    assert a.kf_capacity > 8  # grew
    path = str(tmp_path / "grown.npz")
    checkpoint.save(a, path)
    b = checkpoint.load(path, CAM)
    assert b.kf_capacity == a.kf_capacity
    b.process_chunk(grays[6:], depths[6:])
    np.testing.assert_allclose(b.trajectory(), ref.trajectory(), atol=1e-6)


def test_ba_checkpoint_resume(seq, tmp_path):
    """FusedBASlam checkpoint restores the full (sparse + track) state:
    resumed run == uninterrupted run bit-identically."""
    from onepiece_tpu.systems.fused_ba import FusedBASlam

    grays, depths, _ = seq
    kw = dict(max_keypoints=500, keyframe_disparity=10.0,
              pt_capacity=1024, obs_capacity=2048, ba_iters=4)

    ref = FusedBASlam(CAM, **kw)
    ref.process_chunk(grays[:6], depths[:6])
    ref.process_chunk(grays[6:], depths[6:])
    ref_traj = ref.trajectory()

    a = FusedBASlam(CAM, **kw)
    a.process_chunk(grays[:6], depths[:6])
    path = str(tmp_path / "ba.npz")
    checkpoint.save(a, path)
    b = checkpoint.load(path, CAM)
    assert b.frame_count == 6
    assert b.num_kf == a.num_kf
    assert b.n_pts == a.n_pts
    b.process_chunk(grays[6:], depths[6:])

    np.testing.assert_allclose(b.trajectory(), ref_traj, atol=1e-6)
    assert b.n_pts == ref.n_pts
    assert b.n_obs == ref.n_obs
