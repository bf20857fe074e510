"""Full bundle adjustment: poses + world points, LM with Schur complement.

TPU redesign of `BundleAdjustment` (ref: src/Optimization/BundleAdjustment.cpp:60-289).
The reference assembles sparse U/V/W triplets in a scalar loop over
observations, inverts 3x3 point blocks, forms the reduced camera system with
Eigen block products, and solves with SimplicialLDLT. Here:

  - residuals + 2x6/2x3 Jacobians: one vmap over the padded observation
    tensor (ref ComputeJacobian, BundleAdjustment.cpp:290-331)
  - U (per-frame 6x6) and V (per-point 3x3): scatter-adds
  - V^-1: batched 3x3 solves
  - the Schur reduced system S = U - W V^-1 W^T: observations are grouped
    by point into fixed-width (P, Omax) lists; per-point pair products are
    one einsum, scatter-added into the dense (F, F, 6, 6) camera Hessian
  - LM damping with multiply/rollback schedule matching the reference
    (lambda x2 on error increase with rollback, x0.7 on decrease,
    ref: BundleAdjustment.cpp:248-280)

State: poses are T_cw (world->camera), so reprojection is
pi(T_cw p_w); pose 0 gauge-fixed (ref: :237-247 pose-0 handling).
Distribution: parallel/ba.py shards the observation tensor and psums
U/V/W/S contributions — the math here is written shard-compatible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3

DEFAULT_MAX_ITERS = 20  # ref: BundleAdjustment.cpp LM outer iterations


class BAObservations(NamedTuple):
    frame: jax.Array  # (O,) int32
    point: jax.Array  # (O,) int32
    uv: jax.Array  # (O, 2) float32 observed pixels
    valid: jax.Array  # (O,) bool
    obs_of_point: jax.Array  # (P, Omax) int32 indices into O, -1 padded


class BAProblem(NamedTuple):
    poses: jax.Array  # (F, 4, 4) T_cw
    points: jax.Array  # (P, 3) world points
    obs: BAObservations


def build_observations(
    frame_idx: np.ndarray, point_idx: np.ndarray, uv: np.ndarray, num_points: int
) -> BAObservations:
    """Host helper: pack observation arrays + per-point gather lists."""
    o = len(frame_idx)
    counts = np.bincount(point_idx, minlength=num_points)
    omax = max(int(counts.max()) if o else 1, 1)
    lists = np.full((num_points, omax), -1, np.int64)
    fill = np.zeros(num_points, np.int64)
    for i, p in enumerate(point_idx):
        lists[p, fill[p]] = i
        fill[p] += 1
    return BAObservations(
        jnp.asarray(frame_idx, jnp.int32),
        jnp.asarray(point_idx, jnp.int32),
        jnp.asarray(uv, jnp.float32),
        jnp.ones((o,), bool),
        jnp.asarray(lists, jnp.int32),
    )


def _residuals_jacobians(poses, points, obs, fx, fy, cx, cy):
    """Per-observation r (O, 2), J_pose (O, 2, 6), J_point (O, 2, 3), w (O,)."""
    T = poses[obs.frame]  # (O, 4, 4)
    pw = points[obs.point]  # (O, 3)
    pc = jnp.einsum("oij,oj->oi", T[:, :3, :3], pw) + T[:, :3, 3]
    z = pc[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = pc[:, 0] / zs * fx + cx
    v = pc[:, 1] / zs * fy + cy
    r = jnp.stack([u, v], -1) - obs.uv
    w = (obs.valid & (z > 1e-6)).astype(jnp.float32)

    iz = 1.0 / zs
    # d(u,v)/d p_cam  (O, 2, 3)
    J_pc = jnp.stack(
        [
            jnp.stack([fx * iz, jnp.zeros_like(z), -fx * pc[:, 0] * iz * iz], -1),
            jnp.stack([jnp.zeros_like(z), fy * iz, -fy * pc[:, 1] * iz * iz], -1),
        ],
        axis=1,
    )
    # pose: p_cam = exp(xi) T p_w => dp/dxi = [I | -[p_cam]_x]
    Jp_lin = J_pc
    Jp_ang = jnp.einsum("okj,oji->oki", J_pc, -se3.skew(pc))
    J_pose = jnp.concatenate([Jp_lin, Jp_ang], axis=-1)  # (O, 2, 6)
    J_point = jnp.einsum("okj,oji->oki", J_pc, T[:, :3, :3])  # (O, 2, 3)
    return r, J_pose, J_point, w


@functools.partial(jax.jit, static_argnames=("num_frames", "num_points"))
def ba_cost(problem: BAProblem, fx, fy, cx, cy, num_frames: int, num_points: int):
    r, _, _, w = _residuals_jacobians(problem.poses, problem.points, problem.obs, fx, fy, cx, cy)
    return jnp.sum(w * jnp.sum(r * r, -1)), jnp.sum(w)


@functools.partial(jax.jit, static_argnames=("num_frames", "num_points"))
def ba_step(
    problem: BAProblem,
    lam: jax.Array,
    fx, fy, cx, cy,
    num_frames: int,
    num_points: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One damped step: returns (new_poses, new_points, predicted_ok)."""
    poses, points, obs = problem
    F, P = num_frames, num_points
    r, J_pose, J_point, w = _residuals_jacobians(poses, points, obs, fx, fy, cx, cy)

    U = jnp.zeros((F, 6, 6)).at[obs.frame].add(
        jnp.einsum("oki,o,okj->oij", J_pose, w, J_pose)
    )
    V = jnp.zeros((P, 3, 3)).at[obs.point].add(
        jnp.einsum("oki,o,okj->oij", J_point, w, J_point)
    )
    W = jnp.einsum("oki,o,okj->oij", J_pose, w, J_point)  # (O, 6, 3)
    b_c = jnp.zeros((F, 6)).at[obs.frame].add(jnp.einsum("oki,o,ok->oi", J_pose, w, r))
    b_p = jnp.zeros((P, 3)).at[obs.point].add(jnp.einsum("oki,o,ok->oi", J_point, w, r))

    # LM damping (ref: BundleAdjustment.cpp:175-187 adds lambda to diagonals)
    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[None]
    Vinv = jnp.linalg.inv(V)  # batched 3x3

    # Schur: per-point pair reduction
    lists = obs.obs_of_point  # (P, Omax)
    lmask = lists >= 0
    safe = jnp.clip(lists, 0, max(W.shape[0] - 1, 0))
    Wp = jnp.where(lmask[..., None, None], W[safe], 0.0)  # (P, Omax, 6, 3)
    fidx = jnp.where(lmask, obs.frame[safe], 0)  # (P, Omax)
    Y = jnp.einsum("poik,pkl->poil", Wp, Vinv)  # (P, Omax, 6, 3)
    pair = jnp.einsum("paik,pbjk->pabij", Y, Wp)  # (P, Omax, Omax, 6, 6)
    S = jnp.zeros((F, F, 6, 6))
    S = S.at[fidx[:, :, None], fidx[:, None, :]].add(pair)
    S = (
        jnp.zeros((F, F, 6, 6)).at[jnp.arange(F), jnp.arange(F)].set(U) - S
    )
    yb = jnp.einsum("poik,pk->poi", Y, b_p)  # (P, Omax, 6)
    rhs_c = b_c - jnp.zeros((F, 6)).at[fidx.reshape(-1)].add(yb.reshape(-1, 6))

    Sd = S.transpose(0, 2, 1, 3).reshape(F * 6, F * 6)
    bd = rhs_c.reshape(F * 6)
    A = Sd[6:, 6:]
    L = jnp.linalg.cholesky(A + 1e-9 * jnp.eye(6 * (F - 1)))
    dc = jax.scipy.linalg.cho_solve((L, True), -bd[6:])
    ok = jnp.all(jnp.isfinite(dc))
    dc = jnp.where(ok, dc, 0.0)
    delta_c = jnp.concatenate([jnp.zeros((1, 6)), dc.reshape(F - 1, 6)], axis=0)

    # back-substitute points: dp = -V^-1 (b_p + W^T dc) summed over point's obs
    wtd = jnp.einsum("poik,poi->pok", Wp, delta_c[fidx])  # (P, Omax, 3) -> sum
    wtdc = jnp.sum(wtd, axis=1)
    dp = -jnp.einsum("pij,pj->pi", Vinv, b_p + wtdc)
    dp = jnp.where(ok, dp, 0.0)

    new_poses = jnp.einsum("fij,fjk->fik", se3.se3_exp(delta_c), poses)
    new_points = points + dp
    return new_poses, new_points, ok


def optimize(
    problem: BAProblem,
    fx: float, fy: float, cx: float, cy: float,
    max_iters: int = DEFAULT_MAX_ITERS,
    lam0: float = 1e-4,
    verbose: bool = False,
) -> tuple[BAProblem, float]:
    """LM loop with rollback (host-controlled like the reference's outer loop).

    Returns (optimized problem, final mean squared reprojection error).
    """
    F = problem.poses.shape[0]
    P = problem.points.shape[0]
    lam = lam0
    cost, wsum = ba_cost(problem, fx, fy, cx, cy, F, P)
    cost = float(cost)
    for it in range(max_iters):
        new_poses, new_points, _ = ba_step(
            problem, jnp.float32(lam), fx, fy, cx, cy, F, P
        )
        cand = BAProblem(new_poses, new_points, problem.obs)
        new_cost = float(ba_cost(cand, fx, fy, cx, cy, F, P)[0])
        if new_cost < cost:
            problem = cand
            cost = new_cost
            lam = max(lam * 0.7, 1e-9)  # ref: lambda x0.7 on success
        else:
            lam = min(lam * 2.0, 1e6)  # ref: x2 + rollback on failure
        if verbose:
            print(f"BA iter {it}: cost {cost:.6f} lam {lam:.2e}")
    denom = float(ba_cost(problem, fx, fy, cx, cy, F, P)[1])
    return problem, cost / max(denom, 1.0)
