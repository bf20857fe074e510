"""Multi-scale dense RGB-D tracking (direct photometric+geometric alignment).

TPU redesign of `Odometry::DenseTracking` + `MultiScaleComputing`
(ref: src/Odometry/Odometry.cpp:463-608, :621-685). The whole coarse-to-fine
Gauss-Newton schedule is jitted: each pyramid level runs a fixed-iteration
`lax.fori_loop` whose body is the fused warp/residual/Jacobian/6x6-reduction
op (ops/dense_odometry.py) plus a 6x6 solve — no host round-trips inside a
frame pair.

Conventions:
  `T_ts` maps source-camera points into the target camera frame:
  p_t = T_ts p_s. A world pose chain updates as
  T_w_target = T_w_source @ inv(T_ts)
  (matches ref: example/DenseFusion/DenseSlam.cpp:30).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import PinholeCamera
from ..ops import dense_odometry as dops
from ..ops import image as image_ops

# Reference constants (ref: src/Odometry/OdometryPredefined.h:4-19)
MIN_DEPTH = 0.5
MAX_DEPTH = 4.0
SOBEL_SCALE = 1.0 / 8.0
LAMBDA_HYBRID_DEPTH = 0.5
DEPTH_DIFF_MAX = 0.07  # max |warped z - sampled target z| in meters
DEFAULT_LEVELS = 3
DEFAULT_ITERS = (16, 8, 4)  # coarsest -> ... -> finest? stored finest-first below


class FramePyramid(NamedTuple):
    """Per-level preprocessed data for one RGB-D frame (finest level first)."""

    grays: tuple[jax.Array, ...]  # (H, W) in [0, 1]
    depths: tuple[jax.Array, ...]  # (H, W) meters, 0 invalid
    xyzs: tuple[jax.Array, ...]  # (H, W, 3) camera-frame backprojections


class DenseTrackingResult(NamedTuple):
    T_ts: jax.Array  # (4, 4)
    cost: jax.Array
    num_inliers: jax.Array
    rmse: jax.Array


def _depth_pyr_down(depth: jax.Array) -> jax.Array:
    """Validity-aware 2x2 average: mean of nonzero depths, 0 if all invalid.

    (The reference pyrDowns depth like intensity, which smears zeros across
    boundaries; TPU rebuild avoids poisoning coarse levels.)
    """
    h, w = depth.shape
    d = depth[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2)
    valid = (d > 0).astype(depth.dtype)
    s = jnp.sum(d * valid, axis=(1, 3))
    c = jnp.sum(valid, axis=(1, 3))
    return jnp.where(c > 0, s / jnp.clip(c, 1.0, None), 0.0)


@functools.partial(jax.jit, static_argnames=("camera", "levels", "min_depth", "max_depth"))
def preprocess_frame(
    gray: jax.Array,
    depth: jax.Array,
    camera: PinholeCamera,
    levels: int = DEFAULT_LEVELS,
    min_depth: float = MIN_DEPTH,
    max_depth: float = MAX_DEPTH,
) -> FramePyramid:
    """Gray/depth -> pyramids + XYZ backprojections.

    (ref: Odometry.cpp:609-620 `InitializeRGBDDenseTracking` — gray/255,
    NaN-clip depth to [0.5, 4], Gaussian smooth; :436-461 pyramid builds.)
    """
    g = gray.astype(jnp.float32)
    g = image_ops.gaussian_blur(g)
    d = image_ops.clip_depth(depth.astype(jnp.float32), min_depth, max_depth)
    grays = [g]
    depths = [d]
    for _ in range(levels - 1):
        grays.append(image_ops.pyr_down(grays[-1]))
        depths.append(_depth_pyr_down(depths[-1]))
    cams = camera.pyramid(levels)
    xyzs = tuple(c.backproject_grid(dl) for c, dl in zip(cams, depths))
    return FramePyramid(tuple(grays), tuple(depths), xyzs)


def _track_level(
    T0: jax.Array,
    src_xyz: jax.Array,
    src_gray: jax.Array,
    tgt: dops.TermData,
    cam: PinholeCamera,
    iters: int,
    term: str,
    lambda_depth: float,
    huber_delta: float,
) -> tuple[jax.Array, dops.NormalEquations]:
    src_pts = src_xyz.reshape(-1, 3)
    src_val = src_pts[:, 2] > 0
    src_g = src_gray.reshape(-1)
    fx = jnp.float32(cam.fx)
    fy = jnp.float32(cam.fy)
    cx = jnp.float32(cam.cx)
    cy = jnp.float32(cam.cy)
    lam = jnp.float32(lambda_depth)
    ddm = jnp.float32(DEPTH_DIFF_MAX)

    def body(_, carry):
        T, _ = carry
        ne = dops.normal_equations(
            T, src_pts, src_g, src_val, tgt, fx, fy, cx, cy, lam, ddm,
            term=term, huber_delta=huber_delta,
        )
        return dops.solve_and_update(T, ne), ne

    ne0 = dops.NormalEquations(
        jnp.zeros((6, 6), jnp.float32), jnp.zeros((6,), jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0),
    )
    return jax.lax.fori_loop(0, iters, body, (T0, ne0))


@functools.partial(
    jax.jit,
    static_argnames=("camera", "iters", "term", "huber_delta", "lambda_depth"),
)
def dense_tracking(
    source: FramePyramid,
    target: FramePyramid,
    camera: PinholeCamera,
    init_T: jax.Array | None = None,
    iters: tuple[int, ...] = DEFAULT_ITERS,
    term: str = "hybrid",
    lambda_depth: float = LAMBDA_HYBRID_DEPTH,
    huber_delta: float = 0.0,
) -> DenseTrackingResult:
    """Coarse-to-fine Gauss-Newton alignment of source onto target.

    iters[0] applies to the coarsest level (ref: Odometry.cpp:621-685
    `MultiScaleComputing`, iteration counts {16, 8, 4} coarse->fine).
    """
    levels = len(source.grays)
    assert len(iters) == levels
    T = jnp.eye(4, dtype=jnp.float32) if init_T is None else init_T
    cams = camera.pyramid(levels)
    last_ne = None
    for li in reversed(range(levels)):  # coarsest first
        tgt = dops.build_term_data(target.grays[li], target.depths[li], SOBEL_SCALE)
        T, last_ne = _track_level(
            T,
            source.xyzs[li],
            source.grays[li],
            tgt,
            cams[li],
            iters[levels - 1 - li],
            term,
            lambda_depth,
            huber_delta,
        )
    rmse = jnp.sqrt(last_ne.cost / jnp.clip(last_ne.num_inliers, 1.0, None))
    return DenseTrackingResult(T, last_ne.cost, last_ne.num_inliers, rmse)


def chain_pose(T_w_source: jax.Array, T_ts: jax.Array) -> jax.Array:
    """T_w_target = T_w_source @ inv(T_ts) (ref: DenseSlam.cpp:30)."""
    return T_w_source @ se3.inverse_T(T_ts)
