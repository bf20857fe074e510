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
def dense_tracking_exact(
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

    This is the reference-exact formulation with per-iteration bilinear
    gathers — numerically the baseline, but TPU gathers cost ~7ns/index so
    per-iteration gathers are slow there; `dense_tracking` (pre-warp +
    stencil) is the TPU-fast path validated against this one.
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


# ---------------------------------------------------------------------------
# TPU-fast path: per-level nearest pre-warp (one gather) + gather-free
# stencil sampling inside the GN loop. See ops/warp.py for the rationale.
# ---------------------------------------------------------------------------


def _nearest_prewarp(
    grays: jax.Array, depths: jax.Array, uv0f: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest-neighbour warp of (gray, depth, valid) by rounded coords.

    Returns (stack6 (6, H, W) = warped gray/gx/gy/depth/zx/zy planes,
             stack_valid (H, W), uv0i (H, W, 2) the rounded base coords).
    Nearest pre-warp + bilinear stencil == direct bilinear sampling, because
    the stencil interpolates the residual d = uv_true - uv0i exactly.
    """
    h, w = grays.shape
    uv0i = jnp.round(uv0f)
    ui = uv0i[..., 0].astype(jnp.int32)
    vi = uv0i[..., 1].astype(jnp.int32)
    inb = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    uic = jnp.clip(ui, 0, w - 1)
    vic = jnp.clip(vi, 0, h - 1)
    src = jnp.stack([grays, depths, (depths > 0).astype(jnp.float32)], axis=-1)
    warped = src.reshape(-1, 3)[vic * w + uic]  # ONE gather
    warped = jnp.where(inb[..., None], warped, 0.0)
    g_w, z_w, ind = warped[..., 0], warped[..., 1], warped[..., 2]
    gx, gy = image_ops.sobel(g_w)
    zx, zy = image_ops.sobel(z_w)
    s = SOBEL_SCALE
    stack6 = jnp.stack([g_w, gx * s, gy * s, z_w, zx * s, zy * s], axis=0)
    valid = inb & (ind > 0.5)
    return stack6, valid, uv0i


def _track_level_prewarp(
    T0: jax.Array,
    src_xyz: jax.Array,  # (H, W, 3)
    src_gray: jax.Array,  # (H, W)
    tgt_gray: jax.Array,  # (H, W)
    tgt_depth: jax.Array,  # (H, W)
    cam: PinholeCamera,
    iters: int,
    radius: int,
    lambda_depth: float,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..ops import warp as warp_ops

    fx = jnp.float32(cam.fx)
    fy = jnp.float32(cam.fy)
    cx = jnp.float32(cam.cx)
    cy = jnp.float32(cam.cy)
    z_src = src_xyz[..., 2]
    src_valid = z_src > 0

    def project(T):
        R = T[:3, :3]
        t = T[:3, 3]
        p = jnp.einsum("ij,hwj->hwi", R, src_xyz) + t
        z = p[..., 2]
        zs = jnp.where(z > 1e-6, z, 1.0)
        u = p[..., 0] / zs * fx + cx
        v = p[..., 1] / zs * fy + cy
        return p, z, jnp.stack([u, v], axis=-1)

    # pre-warp at level entry with T0 (one gather)
    _, _, uv0f = project(T0)
    stack6, stack_valid, uv0i = _nearest_prewarp(tgt_gray, tgt_depth, uv0f)

    # Spatial Jacobian of the pre-warp map, J_w = d(uv0f)/d(x): sampling the
    # pre-warped stack at x + delta reads the target near
    # uv0f(x) + J_w delta, so the GN displacement must be corrected by
    # J_w^{-1} — without it, a non-identity base pose (e.g. previous-frame
    # init) biases the sampled gradients and the tracker drifts.
    def _grad_xy(f):
        gx = jnp.zeros_like(f).at[:, 1:-1].set((f[:, 2:] - f[:, :-2]) * 0.5)
        gy = jnp.zeros_like(f).at[1:-1, :].set((f[2:, :] - f[:-2, :]) * 0.5)
        return gx, gy

    a11, a12 = _grad_xy(uv0f[..., 0])  # du0/dx, du0/dy
    a21, a22 = _grad_xy(uv0f[..., 1])  # dv0/dx, dv0/dy
    detJ = a11 * a22 - a12 * a21
    # fall back to identity where the warp map is degenerate (invalid depth,
    # depth discontinuities)
    ok_j = (jnp.abs(detJ) > 0.25) & (jnp.abs(detJ) < 4.0)
    inv_det = jnp.where(ok_j, 1.0 / jnp.where(ok_j, detJ, 1.0), 1.0)
    j11 = jnp.where(ok_j, a22 * inv_det, 1.0)
    j12 = jnp.where(ok_j, -a12 * inv_det, 0.0)
    j21 = jnp.where(ok_j, -a21 * inv_det, 0.0)
    j22 = jnp.where(ok_j, a11 * inv_det, 1.0)

    lam = jnp.float32(lambda_depth)
    ddm = jnp.float32(DEPTH_DIFF_MAX)

    def body(_, carry):
        T, _c, _n = carry
        p, z, uv = project(T)
        # displacement in the pre-warped frame: J_w^{-1} (uv - uv0f),
        # plus the sub-pixel offset the nearest rounding introduced
        ru = uv[..., 0] - uv0f[..., 0]
        rv = uv[..., 1] - uv0f[..., 1]
        du = j11 * ru + j12 * rv + (uv0f[..., 0] - uv0i[..., 0])
        dv = j21 * ru + j22 * rv + (uv0f[..., 1] - uv0i[..., 1])
        d = jnp.stack([du, dv])
        vals, ok = warp_ops.stencil_sample(stack6, stack_valid, d, radius)
        g, gx_w, gy_w, zt, ztx_w, zty_w = (vals[i] for i in range(6))
        # The sampled gradients are Sobel of the WARPED image, i.e. distorted
        # by the pre-warp map: [gx_w, gy_w]^T = J_w^T [dI/du, dI/dv]^T.
        # Rotate them back to target-pixel frame with J_w^{-T} (entries j*),
        # or the GN direction is biased by O(J_w - I) — which is exactly the
        # frame-to-frame motion under a constant-velocity init.
        gx = j11 * gx_w + j21 * gy_w
        gy = j12 * gx_w + j22 * gy_w
        ztx = j11 * ztx_w + j21 * zty_w
        zty = j12 * ztx_w + j22 * zty_w
        r_i = g - src_gray
        r_z = zt - z
        valid = ok & src_valid & (z > 1e-6) & (jnp.abs(r_z) < ddm)

        # Jacobian rows as 6 image planes each (channels-first: W on lanes)
        px, py = p[..., 0], p[..., 1]
        inv_z = 1.0 / jnp.where(z > 1e-6, z, 1.0)
        a = fx * inv_z
        b = fy * inv_z

        def twist_rows(cx_, cy_, extra_z=0.0):
            # row = cx_ * du/dp + cy_ * dv/dp (+ extra_z * e_z), then [row | p x row]
            g1 = cx_ * a
            g2 = cy_ * b
            g3 = -(cx_ * a * px + cy_ * b * py) * inv_z + extra_z
            w1 = py * g3 - z * g2
            w2 = z * g1 - px * g3
            w3 = px * g2 - py * g1
            return (g1, g2, g3, w1, w2, w3)

        Ji = twist_rows(gx, gy)
        Jz = twist_rows(ztx, zty, extra_z=-1.0)

        vf = valid.astype(jnp.float32)
        wi = vf * (1.0 - lam)
        wz = vf * lam
        Ji_m = jnp.stack([x.reshape(-1) for x in Ji])  # (6, N)
        Jz_m = jnp.stack([x.reshape(-1) for x in Jz])
        wi_f = wi.reshape(-1)
        wz_f = wz.reshape(-1)
        JTJ = jnp.einsum("in,n,jn->ij", Ji_m, wi_f, Ji_m) + jnp.einsum(
            "in,n,jn->ij", Jz_m, wz_f, Jz_m
        )
        JTr = Ji_m @ (wi_f * r_i.reshape(-1)) + Jz_m @ (wz_f * r_z.reshape(-1))
        cost = jnp.sum(wi * r_i * r_i + wz * r_z * r_z)
        nin = jnp.sum(vf)
        A = JTJ + 1e-6 * jnp.eye(6, dtype=JTJ.dtype)
        xi = jnp.linalg.solve(A, -JTr)
        good = jnp.all(jnp.isfinite(xi)) & (nin > 6)
        xi = jnp.where(good, xi, 0.0)
        return se3.se3_exp(xi) @ T, cost, nin

    T, cost, nin = jax.lax.fori_loop(
        0, iters, body, (T0, jnp.float32(0.0), jnp.float32(0.0))
    )
    return T, cost, nin, uv0i


@functools.partial(
    jax.jit,
    static_argnames=("camera", "iters", "radii", "lambda_depth", "polish"),
)
def dense_tracking(
    source: FramePyramid,
    target: FramePyramid,
    camera: PinholeCamera,
    init_T: jax.Array | None = None,
    iters: tuple[int, ...] = DEFAULT_ITERS,
    radii: tuple[int, ...] = (8, 4, 4),
    lambda_depth: float = LAMBDA_HYBRID_DEPTH,
    polish: int = 2,
) -> DenseTrackingResult:
    """TPU-fast multi-scale dense tracking (pre-warp + stencil).

    Per level: ONE nearest-neighbour gather rebases the target onto the
    source grid at the level-entry pose, then `iters` gather-free GN
    iterations sample the pre-warped stack with a (2r+1)^2 stencil.
    radii[0] is the coarsest level's stencil radius (largest because the
    init pose is least converged there). Numerics match
    `dense_tracking_exact` to the warp-smoothness approximation.

    `polish` > 0 adds one RE-LINEARISATION round at the finest level: a
    fresh pre-warp at the converged pose plus `polish` extra stencil
    iterations (radius 2). With the base pose at the solution the residual
    displacement is sub-pixel, so the pre-warp approximation error is
    second-order — this recovers the exact bilinear path's accuracy for the
    cost of one extra nearest gather (~1 ms), not 28 of them.
    """
    levels = len(source.grays)
    assert len(iters) == levels and len(radii) == levels
    T = jnp.eye(4, dtype=jnp.float32) if init_T is None else init_T
    cams = camera.pyramid(levels)
    cost = jnp.float32(0.0)
    nin = jnp.float32(1.0)
    for li in reversed(range(levels)):  # coarsest first
        k = levels - 1 - li
        T, cost, nin, _ = _track_level_prewarp(
            T,
            source.xyzs[li],
            source.grays[li],
            target.grays[li],
            target.depths[li],
            cams[li],
            iters[k],
            radii[k],
            lambda_depth,
        )
    if polish > 0:
        T, cost, nin, _ = _track_level_prewarp(
            T,
            source.xyzs[0],
            source.grays[0],
            target.grays[0],
            target.depths[0],
            cams[0],
            polish,
            2,
            lambda_depth,
        )
    rmse = jnp.sqrt(cost / jnp.clip(nin, 1.0, None))
    return DenseTrackingResult(T, cost, nin, rmse)
