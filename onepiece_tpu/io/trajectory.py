"""Trajectory IO and ATE evaluation.

The reference writes trajectories as rows of 16 floats (row-major 4x4,
ref: example/DenseFusion/DenseFusion.cpp:98-101) and leaves ATE evaluation
to the external TUM tool; the rebuild ships both formats and the evaluator.
"""

from __future__ import annotations

import numpy as np


def write_matrix_trajectory(path: str, poses: np.ndarray) -> None:
    """Write (N, 4, 4) poses as 16-float rows (ref: DenseFusion.cpp:98-101)."""
    flat = np.asarray(poses).reshape(len(poses), 16)
    np.savetxt(path, flat, fmt="%.9f")


def read_matrix_trajectory(path: str) -> np.ndarray:
    flat = np.loadtxt(path)
    if flat.ndim == 1:
        flat = flat[None]
    return flat.reshape(-1, 4, 4)


def write_tum_trajectory(path: str, timestamps: np.ndarray, poses: np.ndarray) -> None:
    """TUM format: `t tx ty tz qx qy qz qw` per line."""
    from scipy.spatial.transform import Rotation

    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses):
            q = Rotation.from_matrix(T[:3, :3]).as_quat()  # x y z w
            t = T[:3, 3]
            f.write(f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} {q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def read_tum_trajectory(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps (N,), poses (N, 4, 4))."""
    from scipy.spatial.transform import Rotation

    rows = np.loadtxt(path, comments="#")
    if rows.ndim == 1:
        rows = rows[None]
    ts = rows[:, 0]
    t = rows[:, 1:4]
    q = rows[:, 4:8]
    R = Rotation.from_quat(q).as_matrix()
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return ts, poses


def align_umeyama(est: np.ndarray, gt: np.ndarray, with_scale: bool = False) -> np.ndarray:
    """Best similarity/rigid transform aligning est positions (N, 3) to gt (N, 3).

    Horn/Umeyama closed form — the method inside the standard TUM
    evaluate_ate tool. Returns a 4x4 transform (rotation+translation; scale
    folded into rotation when with_scale).
    """
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    ec = est - mu_e
    gc = gt - mu_g
    H = gc.T @ ec / len(est)
    U, S, Vt = np.linalg.svd(H)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1.0
    R = U @ D @ Vt
    if with_scale:
        var_e = (ec**2).sum() / len(est)
        s = np.trace(np.diag(S) @ D) / var_e
    else:
        s = 1.0
    T = np.eye(4)
    T[:3, :3] = s * R
    T[:3, 3] = mu_g - s * R @ mu_e
    return T


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE between (N, 4, 4) pose arrays."""
    est = np.asarray(est_poses)[:, :3, 3]
    gt = np.asarray(gt_poses)[:, :3, 3]
    if align:
        T = align_umeyama(est, gt)
        est = est @ T[:3, :3].T + T[:3, 3]
    err = est - gt
    return float(np.sqrt((err**2).sum(axis=-1).mean()))


def rpe_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1) -> tuple[float, float]:
    """Relative pose error RMSE (translational meters, rotational radians)."""
    est = np.asarray(est_poses)
    gt = np.asarray(gt_poses)
    terrs, rerrs = [], []
    for i in range(len(est) - delta):
        de = np.linalg.inv(est[i]) @ est[i + delta]
        dg = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(dg) @ de
        terrs.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerrs.append(np.arccos(c))
    return float(np.sqrt(np.mean(np.square(terrs)))), float(np.sqrt(np.mean(np.square(rerrs))))
