"""Rigid-transform estimation and geometric fitting, batched-first.

TPU-native replacements for the reference's Eigen/SVD-based fitting
(ref: src/Geometry/Geometry.cpp:107-262). Every function is written to be
vmapped over a leading batch axis — batched Kabsch over thousands of RANSAC
hypotheses is the design center, not an afterthought.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import make_T


def kabsch(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Weighted rigid transform T (4,4) minimising ||T(src) - dst||^2.

    Kabsch/Umeyama via SVD (ref: src/Geometry/Geometry.cpp:107-151
    `EstimateRigidTransformation`). Handles the reflection case by flipping
    the smallest singular vector. Works under vmap: src/dst (..., N, 3),
    weights (..., N) -> (..., 4, 4).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 1e-12, None)
    mu_s = jnp.sum(src * w[..., None], axis=-2)
    mu_d = jnp.sum(dst * w[..., None], axis=-2)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    # covariance H = sum_i w_i * dc_i sc_i^T  (3x3)
    H = jnp.einsum("...ni,...nj->...ij", dc * w[..., None], sc)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = jnp.einsum("...ij,...jk,...kl->...il", U, D, Vt)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return make_T(R, t)


def fit_plane(points: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Least-squares plane (n, d) with |n|=1, n.p + d = 0.

    (ref: src/Geometry/Geometry.cpp:172-220 `FitPlane`). points (..., N, 3)
    -> (..., 4). Uses the eigenvector of the smallest eigenvalue of the
    centered covariance (via SVD for stability).
    """
    if weights is None:
        weights = jnp.ones(points.shape[:-1], dtype=points.dtype)
    w = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 1e-12, None)
    mu = jnp.sum(points * w[..., None], axis=-2)
    c = (points - mu[..., None, :]) * jnp.sqrt(w)[..., None]
    # smallest right-singular vector of the centered point matrix
    _, _, Vt = jnp.linalg.svd(c, full_matrices=False)
    n = Vt[..., 2, :]
    d = -jnp.einsum("...i,...i->...", n, mu)
    return jnp.concatenate([n, d[..., None]], axis=-1)


def fit_line(points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Least-squares 3D line as (origin, direction).

    (ref: src/Geometry/Geometry.cpp:222-262 `FitLine`): direction is the
    largest principal axis of the centered covariance.
    """
    mu = jnp.mean(points, axis=-2)
    c = points - mu[..., None, :]
    _, _, Vt = jnp.linalg.svd(c, full_matrices=False)
    return mu, Vt[..., 0, :]


def plane_point_distance(plane: jax.Array, points: jax.Array) -> jax.Array:
    """Signed distances. plane (..., 4), points (..., N, 3) -> (..., N)."""
    return jnp.einsum("...i,...ni->...n", plane[..., :3], points) + plane[..., 3:4]


def estimate_normals_from_neighbors(neighbors: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-point normal from its K gathered neighbors.

    neighbors (..., N, K, 3), valid (..., N, K) -> unit normals (..., N, 3).
    TPU-native replacement for the KD-tree + per-point plane fit of
    `PointCloud::EstimateNormals` (ref: src/Geometry/PointCloud.cpp:102-144):
    the neighbor gather happens upstream (brute-force top-k on device), here
    we batch the smallest-eigenvector extraction with eigh on 3x3 covariances.
    """
    w = valid.astype(neighbors.dtype)
    wsum = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0, None)
    mu = jnp.sum(neighbors * w[..., None], axis=-2) / wsum
    c = (neighbors - mu[..., None, :]) * w[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", c, c)
    # 3x3 symmetric eigendecomposition, batched; smallest eigenvector = normal
    evals, evecs = jnp.linalg.eigh(cov)
    n = evecs[..., :, 0]
    nrm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.clip(nrm, 1e-12, None)
