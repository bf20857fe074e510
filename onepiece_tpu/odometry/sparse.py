"""Sparse feature-based RGB-D odometry.

TPU redesign of `Odometry::SparseTracking(MILD)` (ref:
src/Odometry/Odometry.cpp:91-168 (BF), :170-252 / :351-435 (MILD variant)):
detect ORB-style features, match descriptors (exhaustive hamming replaces
MILD's multi-index hash), filter outliers (validity / pairwise-consistency
RanSaPC), estimate the rigid transform with batched RANSAC over 3D-3D
correspondences, then pose-guided re-match and re-estimate.

Pipeline stages are individually jitted; the orchestration (two match
rounds) is host-side like the reference but with no per-feature loops.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import PinholeCamera
from ..ops import hamming, image as image_ops, ransac
from . import features as feat

# reference thresholds (ref: src/Odometry/Odometry.cpp SparseTrackingMILD and
# SparseOdometryFunction.cpp RANSAC3d)
RANSAC_THRESHOLD = 0.05
RANSAC_HYPOTHESES = 400
RANSAC_SAMPLES = 8
RANSAPC_ROUNDS = 5  # ref: Odometry.cpp:400-404 applies RanSaPC 5x
MIN_INLIERS = 20


class SparseFrame(NamedTuple):
    """Per-frame sparse data: keypoints + backprojected 3D points."""

    kp: feat.Keypoints
    points: jax.Array  # (K, 3) camera-frame 3D points at keypoints
    valid: jax.Array  # (K,) keypoint has valid depth


class SparseTrackingResult(NamedTuple):
    T_ts: jax.Array  # (4, 4) source -> target
    num_inliers: jax.Array
    rmse: jax.Array
    success: jax.Array  # bool
    corr_src: jax.Array  # (K, 3) matched source points (masked)
    corr_dst: jax.Array  # (K, 3) matched target points
    corr_valid: jax.Array  # (K,)
    corr_idx: jax.Array  # (K,) matched TARGET keypoint index per source kp


@functools.partial(jax.jit, static_argnames=("camera", "max_keypoints", "threshold"))
def extract_sparse_frame(
    gray: jax.Array,
    depth: jax.Array,
    camera: PinholeCamera,
    max_keypoints: int = 1000,
    threshold: float = 0.05,
) -> SparseFrame:
    """Detect features and backproject them with the depth image.

    (ref: Odometry.cpp:66-85 `GetLocalPointsFromKeyPoints`.)
    """
    kp = feat.detect_and_describe(gray, max_keypoints=max_keypoints, threshold=threshold)
    ui = jnp.clip(jnp.round(kp.uv[:, 0]), 0, camera.width - 1).astype(jnp.int32)
    vi = jnp.clip(jnp.round(kp.uv[:, 1]), 0, camera.height - 1).astype(jnp.int32)
    z = depth[vi, ui]
    pts = camera.backproject(kp.uv, z)
    valid = kp.valid & (z > 0)
    return SparseFrame(kp, pts, valid)


@functools.partial(jax.jit, static_argnames=("camera",))
def _match_and_estimate(
    key: jax.Array,
    source: SparseFrame,
    target: SparseFrame,
    camera: PinholeCamera,
) -> SparseTrackingResult:
    # round 1: descriptor match + ratio test
    idx, ok = hamming.match_descriptors(
        source.kp.desc, source.valid, target.kp.desc, target.valid
    )
    src_pts = source.points
    dst_pts = target.points[idx]
    ok = ok & target.valid[idx]

    # RanSaPC pairwise-consistency rounds (ref: Odometry.cpp:400-404)
    keys = jax.random.split(key, RANSAPC_ROUNDS + 2)
    for r in range(RANSAPC_ROUNDS):
        ok = ransac.ransapc_filter(keys[r], src_pts, dst_pts, ok)

    res1 = ransac.ransac_rigid(
        keys[-2], src_pts, dst_pts, ok,
        threshold=RANSAC_THRESHOLD,
        num_hypotheses=RANSAC_HYPOTHESES,
        sample_size=RANSAC_SAMPLES,
    )

    # round 2: pose-guided re-match (ref: SparseMatcher.cpp:25-50)
    pred = src_pts @ res1.T[:3, :3].T + res1.T[:3, 3]
    uv_pred, _ = camera.project(pred)
    idx2, ok2 = hamming.match_descriptors_windowed(
        source.kp.desc, source.valid, target.kp.desc, target.valid,
        uv_pred, target.kp.uv,
    )
    dst2 = target.points[idx2]
    ok2 = ok2 & target.valid[idx2]
    res2 = ransac.ransac_rigid(
        keys[-1], src_pts, dst2, ok2,
        threshold=RANSAC_THRESHOLD,
        num_hypotheses=RANSAC_HYPOTHESES,
        sample_size=RANSAC_SAMPLES,
    )

    use2 = res2.num_inliers >= res1.num_inliers
    T = jnp.where(use2, res2.T, res1.T)
    nin = jnp.where(use2, res2.num_inliers, res1.num_inliers)
    rmse = jnp.where(use2, res2.rmse, res1.rmse)
    corr_dst = jnp.where(use2, dst2, dst_pts)
    corr_ok = jnp.where(use2, res2.inliers, res1.inliers)
    corr_idx = jnp.where(use2, idx2, idx)
    return SparseTrackingResult(
        T, nin, rmse, nin >= MIN_INLIERS, src_pts, corr_dst, corr_ok, corr_idx
    )


def sparse_tracking(
    source: SparseFrame,
    target: SparseFrame,
    camera: PinholeCamera,
    key: jax.Array | None = None,
) -> SparseTrackingResult:
    """Estimate T_ts mapping source-frame points into the target frame.

    NOTE the reference's convention: its RANSAC estimates the transform of
    source points onto target points from matched 3D pairs — same here.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    return _match_and_estimate(key, source, target, camera)
