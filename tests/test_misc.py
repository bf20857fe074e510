"""Tests for frustum, geometry2d, config, viz renderer, timers, pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from onepiece_tpu.geometry import geometry2d as g2d
from onepiece_tpu.geometry.camera import PinholeCamera
from onepiece_tpu.integration import frustum
from onepiece_tpu.utils.config import Config

CAM = PinholeCamera(fx=100.0, fy=100.0, cx=79.5, cy=59.5, width=160, height=120, depth_scale=1000.0)


def test_frustum_contains_visible_points():
    planes = frustum.frustum_planes(CAM, jnp.eye(4), near=0.1, far=5.0)
    # points projected inside the image at valid depth must be contained
    pts_in = jnp.asarray([[0.0, 0.0, 1.0], [0.2, 0.1, 2.0], [-0.3, -0.2, 1.5]])
    assert bool(frustum.contains(planes, pts_in).all())
    pts_out = jnp.asarray(
        [[0.0, 0.0, -1.0], [0.0, 0.0, 6.0], [5.0, 0.0, 1.0], [0.0, 0.0, 0.05]]
    )
    assert not bool(frustum.contains(planes, pts_out).any())


def test_frustum_matches_projection():
    rng = np.random.default_rng(5)
    pts = rng.uniform([-2, -2, 0.2], [2, 2, 6], (500, 3)).astype(np.float32)
    planes = frustum.frustum_planes(CAM, jnp.eye(4), near=0.1, far=5.0)
    inside = np.asarray(frustum.contains(planes, jnp.asarray(pts), margin=1e-4))
    uv, z = CAM.project(jnp.asarray(pts))
    proj_in = np.asarray(CAM.in_bounds(uv)) & (np.asarray(z) > 0.1) & (np.asarray(z) < 5.0)
    # frustum test should agree with projection test (tolerate edge pixels)
    agree = (inside == proj_in).mean()
    assert agree > 0.98, agree


def test_geometry2d_predicates():
    assert g2d.segments_intersect([0, 0], [2, 2], [0, 2], [2, 0])
    assert not g2d.segments_intersect([0, 0], [1, 0], [0, 1], [1, 1])
    p = g2d.line_intersection([0, 0], [1, 0], [1, -1], [0, 1])
    np.testing.assert_allclose(p, [1, 0], atol=1e-12)
    assert g2d.line_intersection([0, 0], [1, 0], [0, 1], [1, 0]) is None
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]])
    inside = g2d.point_in_polygon(np.array([[0.5, 0.5], [1.5, 0.5]]), sq)
    assert inside.tolist() == [True, False]
    assert abs(g2d.polygon_area(sq) - 1.0) < 1e-12
    proj, t = g2d.project_point_to_segment([0.5, 1.0], [0, 0], [1, 0])
    np.testing.assert_allclose(proj, [0.5, 0.0])


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.dense.lambda_depth = 0.7
    cfg.integration.voxel_size = 0.02
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    back = Config.from_json(path)
    assert back.dense.lambda_depth == 0.7
    assert back.integration.voxel_size == 0.02
    assert back.slam.submap_size == 50  # untouched default (ref DenseSlam.h:123)


def test_software_renderer():
    from onepiece_tpu.viz.render import render_mesh

    # single triangle in front of the camera
    verts = np.array([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]], np.float32)
    faces = np.array([[0, 1, 2]])
    img = render_mesh(verts, faces, CAM, np.eye(4))
    assert img.shape == (120, 160, 3)
    assert img.max() > 0.1  # something was drawn
    # triangle centroid projects near image center
    cy, cx = np.array(np.nonzero(img[..., 0])).mean(axis=1)
    assert abs(cx - CAM.cx) < 10 and abs(cy - CAM.cy) < 10


@pytest.mark.slow
def test_pipelined_fusion_matches_eager():
    import jax

    from onepiece_tpu.integration.blocks import TSDFVolume
    from onepiece_tpu.systems.pipeline import PipelinedDenseFusion
    from onepiece_tpu.utils import synthetic
    from onepiece_tpu.ops.image import bilateral_filter

    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(5)
    frames = []
    for i in range(5):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), CAM.fx, CAM.fy, CAM.cx, CAM.cy,
            CAM.height, CAM.width,
        )
        frames.append((d, g))
    slam = PipelinedDenseFusion(CAM, voxel_size=0.03, truncation=0.15, volume_capacity=1024)
    for d, g in frames:
        slam.process_frame(g, d)
    est, _ = slam.finalize()
    assert est.shape == (5, 4, 4)
    # eager volume at the SAME estimated poses must agree
    vol = TSDFVolume(voxel_size=0.03, truncation=0.15, capacity=1024)
    for (d, g), T in zip(frames, est):
        rgb = jnp.stack([g, g, g], -1)
        vol.integrate(bilateral_filter(d), rgb, jnp.asarray(T), CAM)
    assert vol.num_active == slam.volume.num_active
    a = np.asarray(slam.volume.weight[: vol.num_active])
    b = np.asarray(vol.weight[: vol.num_active])
    assert (a > 0).sum() == (b > 0).sum()


def test_replay_rgbd_reader_live_contract(tmp_path):
    """ReplayRGBDReader delivers TUM frames on the replay clock and ends
    with None (the OpenNIReader live-loop contract)."""
    import time

    import imageio.v2 as iio

    from onepiece_tpu.io.openni import ReplayRGBDReader

    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    lines_rgb, lines_d = [], []
    for i in range(3):
        ts = f"{i * 0.1:.6f}"
        iio.imwrite(root / "rgb" / f"{ts}.png", np.full((8, 8, 3), i * 40, np.uint8))
        iio.imwrite(root / "depth" / f"{ts}.png", np.full((8, 8), 5000, np.uint16))
        lines_rgb.append(f"{ts} rgb/{ts}.png")
        lines_d.append(f"{ts} depth/{ts}.png")
    (root / "rgb.txt").write_text("\n".join(lines_rgb) + "\n")
    (root / "depth.txt").write_text("\n".join(lines_d) + "\n")

    r = ReplayRGBDReader(str(root), rate_hz=50.0)
    assert r.init()
    t0 = time.monotonic()
    frames = []
    while True:
        item = r.get_next_rgbd()
        if item is None:
            break
        frames.append(item)
    elapsed = time.monotonic() - t0
    assert len(frames) == 3
    assert elapsed >= 2 / 50.0  # frames were paced, not dumped
    ts, rgb, depth = frames[1]
    assert rgb.shape == (8, 8, 3)
    assert float(depth[0, 0]) == 1.0  # 5000 / depth_scale
    r.close()


def test_numeric_debug_mode_traps_nans():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from onepiece_tpu.utils import debug

    debug.enable_numeric_checks()
    try:
        @jax.jit
        def bad(x):
            return jnp.log(x)

        with _pytest.raises(Exception):
            np.asarray(bad(jnp.float32(-1.0)))
        # clean computations still pass with checks on
        g = jnp.linalg.solve(jnp.eye(3), jnp.ones(3))
        assert np.isfinite(np.asarray(g)).all()
    finally:
        debug.disable_numeric_checks()
