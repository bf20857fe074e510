"""Clustering, patch detection, DCEL arrangement, and room detection tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepiece_tpu.algorithm import dcel, rooms
from onepiece_tpu.algorithm.clustering import kmeans, kmedoids, mean_shift_clusters
from onepiece_tpu.algorithm.patch_detection import detect_patches

RNG = np.random.default_rng(31)


def three_blobs(n=60):
    centers = np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 5.0]])
    pts = np.concatenate([c + RNG.normal(0, 0.3, (n, 2)) for c in centers])
    return pts.astype(np.float32), centers


def test_kmeans_blobs():
    pts, centers = three_blobs()
    c, labels = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones(len(pts), bool), k=3)
    c = np.sort(np.asarray(c), axis=0)
    np.testing.assert_allclose(c, np.sort(centers, axis=0), atol=0.2)
    labels = np.asarray(labels)
    # each blob is one label
    for b in range(3):
        blob = labels[b * 60 : (b + 1) * 60]
        assert (blob == blob[0]).mean() > 0.95


def test_kmedoids_blobs():
    pts, centers = three_blobs()
    med, labels = kmedoids(jax.random.PRNGKey(1), jnp.asarray(pts), jnp.ones(len(pts), bool), k=3)
    med_pts = np.sort(pts[np.asarray(med)], axis=0)
    np.testing.assert_allclose(med_pts, np.sort(centers, axis=0), atol=0.6)


def test_mean_shift_blobs():
    pts, centers = three_blobs(40)
    c, labels = mean_shift_clusters(jnp.asarray(pts), jnp.ones(len(pts), bool), bandwidth=1.0)
    assert len(c) == 3
    np.testing.assert_allclose(np.sort(c, axis=0), np.sort(centers, axis=0), atol=0.3)


def test_plane_patch_detection():
    # two perpendicular planes in 3D
    a = np.c_[RNG.uniform(-1, 1, (150, 2)), np.zeros(150)]  # z=0
    b = np.c_[RNG.uniform(-1, 1, (150, 1)), np.zeros(150), RNG.uniform(0.1, 1.5, (150, 1))]
    b = b[:, [0, 1, 2]]  # y=0 plane
    pts = np.concatenate([a, b]).astype(np.float32)
    from onepiece_tpu.ops.knn import knn

    idx, _ = knn(jnp.asarray(pts), jnp.asarray(pts), jnp.ones(len(pts), bool), k=10)
    patches = detect_patches(pts, np.asarray(idx), residual_threshold=0.03, min_points=50)
    assert len(patches) == 2
    # each patch should be one of the two planes
    normals = [p.model[:3] / np.linalg.norm(p.model[:3]) for p in patches]
    axes = sorted(int(np.argmax(np.abs(n))) for n in normals)
    assert axes == [1, 2]


def test_arrangement_grid():
    # one vertical + one horizontal line through a box -> 4 interior faces
    lines = np.array([[0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]])
    arr = dcel.build_arrangement(lines, box_lo=(-1, -1), box_hi=(1, 1))
    assert len(arr.faces) == 4
    cents = np.sort(dcel.face_centroids(arr), axis=0)
    expect = np.sort(np.array([[-0.5, -0.5], [0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]]), axis=0)
    np.testing.assert_allclose(cents, expect, atol=1e-6)
    adj = dcel.face_adjacency(arr)
    assert len(adj) == 4  # 4 interior shared edges


def test_room_detection_two_rooms():
    # box split by one wall at x=0 with wall evidence -> 2 rooms
    lines = np.array([[0.0, 0.0, 0.0, 1.0]])
    arr = dcel.build_arrangement(lines, box_lo=(-2, -1), box_hi=(2, 1))
    assert len(arr.faces) == 2
    wall_pts = np.c_[np.zeros(100), np.linspace(-1, 1, 100)]
    labels = rooms.detect_rooms(arr, wall_pts, num_rooms=2)
    assert labels[0] != labels[1]


@pytest.mark.slow
def test_plane_patch_detection_room_scale():
    """Room-scan scale (r3 weak #7: the old implementation refit the whole
    patch per CANDIDATE and would crawl here): 30k points on three walls
    must segment into three planes in seconds via incremental stats."""
    import time

    from onepiece_tpu.ops import knn as knn_ops

    rng = np.random.default_rng(0)
    n_per = 10000
    walls = []
    for axis, off in ((0, 0.0), (1, 0.0), (2, 3.0)):
        q = rng.uniform(0.2, 2.8, (n_per, 3))
        q[:, axis] = off + rng.normal(0, 0.004, n_per)
        walls.append(q)
    pts = np.concatenate(walls).astype(np.float32)
    idx, _ = knn_ops.knn(
        jnp.asarray(pts), jnp.asarray(pts), jnp.ones((len(pts),), bool), k=12
    )
    t0 = time.perf_counter()
    patches = detect_patches(
        pts, np.asarray(idx), residual_threshold=0.02, min_points=2000,
        max_patches=8,
    )
    dt = time.perf_counter() - t0
    assert len(patches) == 3, [len(p.indices) for p in patches]
    assert all(len(p.indices) > 0.9 * n_per for p in patches)
    assert dt < 60.0, dt
    # recovered normals axis-aligned
    axes = sorted(int(np.argmax(np.abs(p.model[:3]))) for p in patches)
    assert axes == [0, 1, 2]
