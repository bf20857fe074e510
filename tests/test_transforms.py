"""Kabsch / plane-fit / normal-estimation tests against synthetic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from onepiece_tpu.geometry import se3, transforms
from onepiece_tpu.geometry.pointcloud import PointCloud, voxel_downsample, estimate_normals
from onepiece_tpu.ops import knn as knn_ops

RNG = np.random.default_rng(1)


def test_kabsch_exact_recovery():
    xi = jnp.asarray(RNG.normal(size=6) * 0.7, jnp.float32)
    T_gt = se3.se3_exp(xi)
    src = jnp.asarray(RNG.normal(size=(50, 3)), jnp.float32)
    dst = se3.transform_points(T_gt, src)
    T = transforms.kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)


def test_kabsch_batched_vmap():
    xis = jnp.asarray(RNG.normal(size=(16, 6)) * 0.5, jnp.float32)
    Ts = se3.se3_exp(xis)
    src = jnp.asarray(RNG.normal(size=(16, 20, 3)), jnp.float32)
    dst = se3.transform_points(Ts, src)
    T_est = jax.vmap(transforms.kabsch)(src, dst)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(Ts), atol=5e-4)


def test_kabsch_weighted_ignores_outliers():
    T_gt = se3.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.2, -0.1, 0.15], jnp.float32))
    src = jnp.asarray(RNG.normal(size=(60, 3)), jnp.float32)
    dst = se3.transform_points(T_gt, src)
    dst = dst.at[:10].add(5.0)  # corrupt 10 points
    w = jnp.ones(60).at[:10].set(0.0)
    T = transforms.kabsch(src, dst, w)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)


def test_fit_plane():
    n_gt = np.array([0.3, -0.5, 0.81])
    n_gt /= np.linalg.norm(n_gt)
    d_gt = 0.7
    basis = np.linalg.svd(n_gt[None])[2][1:]  # two vectors orthogonal to n
    coef = RNG.normal(size=(100, 2))
    pts = coef @ basis - d_gt * n_gt
    plane = np.asarray(transforms.fit_plane(jnp.asarray(pts, jnp.float32)))
    n_est = plane[:3] * np.sign(plane[:3] @ n_gt)
    d_est = plane[3] * np.sign(plane[:3] @ n_gt)
    np.testing.assert_allclose(n_est, n_gt, atol=1e-4)
    np.testing.assert_allclose(d_est, d_gt, atol=1e-4)
    # residuals ~ 0
    resid = np.asarray(transforms.plane_point_distance(jnp.asarray(plane), jnp.asarray(pts, jnp.float32)))
    assert np.abs(resid).max() < 1e-4


def test_fit_line():
    d_gt = np.array([1.0, 2.0, -1.0])
    d_gt /= np.linalg.norm(d_gt)
    t = RNG.normal(size=(50, 1))
    pts = t * d_gt + np.array([1.0, 0.0, 2.0])
    origin, direction = transforms.fit_line(jnp.asarray(pts, jnp.float32))
    direction = np.asarray(direction)
    assert abs(abs(direction @ d_gt) - 1.0) < 1e-4


def test_knn_exact():
    ref = jnp.asarray(RNG.normal(size=(500, 3)), jnp.float32)
    q = jnp.asarray(RNG.normal(size=(100, 3)), jnp.float32)
    valid = jnp.ones(500, bool)
    idx, dist = knn_ops.knn(q, ref, valid, k=5, tile=64)
    d_full = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(ref)[None], axis=-1) ** 2
    idx_np = np.argsort(d_full, axis=-1)[:, :5]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=-1), np.sort(idx_np, axis=-1))
    np.testing.assert_allclose(np.sort(np.asarray(dist), -1), np.sort(np.take_along_axis(d_full, idx_np, -1), -1), atol=1e-4)


def test_knn_respects_validity():
    ref = jnp.zeros((10, 3), jnp.float32).at[0].set(jnp.array([100.0, 0, 0]))
    valid = jnp.zeros(10, bool).at[0].set(True)
    q = jnp.zeros((1, 3), jnp.float32)
    idx, dist = knn_ops.knn(q, ref, valid, k=1)
    assert int(idx[0, 0]) == 0


def test_voxel_downsample():
    # two tight clusters, each centred inside one voxel -> 2 representatives
    a = RNG.normal(size=(30, 3)) * 0.001 + 0.25
    b = RNG.normal(size=(30, 3)) * 0.001 + np.array([1.25, 1.25, 1.25])
    cloud = PointCloud.from_numpy(np.concatenate([a, b]).astype(np.float32))
    ds = voxel_downsample(cloud, voxel_size=0.5)
    pts, _, _ = ds.to_numpy()
    assert pts.shape[0] == 2
    centers = np.sort(pts, axis=0)
    np.testing.assert_allclose(centers[0], a.mean(0), atol=1e-3)
    np.testing.assert_allclose(centers[1], b.mean(0), atol=1e-3)


def test_estimate_normals_plane():
    # points on z=1 plane -> normals ±z, oriented toward origin (so -z... camera at origin looking +z: normal should point to origin => -z)
    xy = RNG.uniform(-1, 1, size=(200, 2))
    pts = np.concatenate([xy, np.ones((200, 1))], axis=-1).astype(np.float32)
    cloud = PointCloud.from_numpy(pts)
    cloud = estimate_normals(cloud, k=8)
    nrm, = (np.asarray(cloud.normals)[np.asarray(cloud.valid)],)
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-3)
    assert (nrm[:, 2] < 0).all()  # oriented toward viewpoint


def test_kabsch_fast_matches_svd():
    """Quaternion power-iteration Kabsch == SVD Kabsch on well-posed
    batches (the RANSAC hypothesis path, ops/ransac.py)."""
    import jax
    import functools

    rng = np.random.default_rng(0)
    q = rng.normal(size=(256, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    R = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    t = rng.normal(size=(256, 3))
    src = rng.normal(size=(256, 8, 3)).astype(np.float32)
    dst = (np.einsum("nij,nsj->nsi", R, src) + t[:, None]).astype(np.float32)
    T_svd = np.asarray(jax.vmap(transforms.kabsch)(jnp.asarray(src), jnp.asarray(dst)))
    T_fast = np.asarray(jax.vmap(transforms.kabsch_fast)(jnp.asarray(src), jnp.asarray(dst)))
    err = np.abs(T_svd - T_fast).max(axis=(1, 2))
    # median exact; a small tail of near-180-degree rotations converges
    # slower (harmless inside RANSAC: one wasted hypothesis + SVD refit)
    assert np.median(err) < 1e-4, np.median(err)
    assert (err < 1e-2).mean() > 0.95, (err < 1e-2).mean()
