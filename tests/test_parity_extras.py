"""Small parity features: homography-RANSAC filter, PLY label elements,
ScanNet instance labels, TSDF debug point cloud."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from onepiece_tpu.io import ply, scannet
from onepiece_tpu.ops import ransac, tsdf


def test_homography_filter_rejects_outliers():
    rng = np.random.default_rng(3)
    n = 200
    uv = rng.uniform(50, 590, (n, 2)).astype(np.float32)
    H = np.array([[1.02, 0.01, 5.0], [-0.01, 0.99, -3.0], [1e-5, -2e-5, 1.0]], np.float32)
    ph = np.concatenate([uv, np.ones((n, 1), np.float32)], axis=1) @ H.T
    uv2 = ph[:, :2] / ph[:, 2:3]
    outlier = np.zeros(n, bool)
    outlier[:40] = True
    uv2[outlier] += rng.uniform(30, 80, (40, 2)) * rng.choice([-1, 1], (40, 2))
    mask = np.asarray(
        ransac.homography_filter(
            jax.random.PRNGKey(0), jnp.asarray(uv), jnp.asarray(uv2),
            jnp.ones(n, bool),
        )
    )
    assert mask[~outlier].mean() > 0.95  # inliers kept
    assert mask[outlier].mean() < 0.05  # outliers rejected


def test_ply_label_elements_roundtrip(tmp_path):
    v = np.random.rand(10, 3).astype(np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    labels = {"instance": np.arange(10, dtype=np.int32) % 3,
              "semantic": np.full(10, 7, np.int32)}
    p = str(tmp_path / "m.ply")
    ply.write_ply_mesh(p, v, f, labels=labels)
    out = ply.read_ply(p)
    np.testing.assert_allclose(out["vertices"], v, atol=1e-6)
    np.testing.assert_array_equal(out["labels"]["instance"], labels["instance"])
    np.testing.assert_array_equal(out["labels"]["semantic"], labels["semantic"])


def test_scannet_instance_labels(tmp_path):
    scene = tmp_path / "scene0000_00"
    os.makedirs(scene)
    segs = {"segIndices": [10, 10, 20, 30, 40]}
    agg = {"segGroups": [
        {"label": "chair", "segments": [10, 30]},
        {"label": "table", "segments": [20]},
    ]}
    with open(scene / "scene0000_00_vh_clean.segs.json", "w") as f:
        json.dump(segs, f)
    with open(scene / "scene0000_00_vh_clean.aggregation.json", "w") as f:
        json.dump(agg, f)
    p2o, names = scannet.read_instance_info(str(scene))
    np.testing.assert_array_equal(p2o, [0, 0, 1, 0, -1])
    assert names == ["chair", "table"]


def test_tsdf_debug_point_cloud():
    b = 2
    sdf = np.full((b, 8, 8, 8), tsdf.EMPTY_SDF, np.float32)
    w = np.zeros((b, 8, 8, 8), np.float32)
    sdf[0, 1, 2, 3] = 0.02
    w[0, 1, 2, 3] = 5.0
    sdf[1, 0, 0, 0] = -0.05
    w[1, 0, 0, 0] = 1.0
    sdf[1, 4, 4, 4] = 0.2  # beyond truncation -> excluded
    w[1, 4, 4, 4] = 1.0
    bc = np.array([[0, 0, 0], [1, 0, 0]], np.int32)
    pts, cols, valid = tsdf.debug_point_cloud(
        jnp.asarray(sdf), jnp.asarray(w), jnp.asarray(bc), 0.05, 0.1
    )
    valid = np.asarray(valid)
    assert valid.sum() == 2
    got_cols = np.asarray(cols)[valid]
    np.testing.assert_allclose(sorted(got_cols[:, 0]), [0.2, 0.5], atol=1e-6)
    got_pts = np.asarray(pts)[valid]
    # voxel (1,2,3) of block (0,0,0): center at ((1,2,3)+0.5)*0.05
    assert any(np.allclose(p, (np.array([1, 2, 3]) + 0.5) * 0.05) for p in got_pts)
