"""Region-growing line (2D) and plane (3D) detection.

Rebuild of `algorithm::PatchDetection` (ref: src/Algorithm/PatchDetection.
{h,cpp} — seeded region growing with tangent/residual inlier tests,
`LineDetection` :39+, `PlaneDetection`, `ChooseSeed` :29). The frontier walk
is sequential by nature and stays on the host; the per-candidate residual
and normal tests are vectorised numpy over the neighbour lists that the
device kNN produced.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Patch:
    indices: np.ndarray  # member point indices
    model: np.ndarray  # line: (origin, dir) flat 6; plane: (n, d) 4


def _fit_plane_np(pts: np.ndarray) -> np.ndarray:
    mu = pts.mean(0)
    _, _, vt = np.linalg.svd(pts - mu, full_matrices=False)
    n = vt[-1]
    return np.concatenate([n, [-n @ mu]])


def _fit_line_np(pts: np.ndarray) -> np.ndarray:
    mu = pts.mean(0)
    _, _, vt = np.linalg.svd(pts - mu, full_matrices=False)
    return np.concatenate([mu, vt[0]])


def detect_patches(
    points: np.ndarray,  # (N, D) D=2 lines / D=3 planes
    neighbors: np.ndarray,  # (N, K) kNN indices (device-computed)
    residual_threshold: float = 0.02,
    min_points: int = 20,
    max_patches: int = 64,
) -> list[Patch]:
    """Greedy seeded region growing (ref PatchDetection.cpp)."""
    n, d = points.shape
    assigned = np.zeros(n, bool)
    # per-point local residual = distance to local fit over its kNN, used to
    # choose flat seeds first (ref ChooseSeed :29 — lowest residual)
    local_res = np.zeros(n)
    for i in range(n):
        nb = points[neighbors[i]]
        model = _fit_plane_np(nb) if d == 3 else None
        if d == 3:
            local_res[i] = np.abs(nb @ model[:3] + model[3]).mean()
        else:
            line = _fit_line_np(nb)
            rel = nb - line[:2]
            local_res[i] = np.abs(rel @ np.array([-line[3], line[2]])).mean()
    order = np.argsort(local_res)

    patches: list[Patch] = []
    for seed in order:
        if assigned[seed] or len(patches) >= max_patches:
            continue
        members = {int(seed)}
        frontier = [int(seed)]
        model = None
        while frontier:
            cur = frontier.pop()
            for nb in neighbors[cur]:
                nb = int(nb)
                if nb in members or assigned[nb]:
                    continue
                pts = points[list(members)]
                if len(members) >= 3:
                    model = _fit_plane_np(pts) if d == 3 else _fit_line_np(pts)
                    if d == 3:
                        r = abs(points[nb] @ model[:3] + model[3])
                    else:
                        rel = points[nb] - model[:2]
                        r = abs(rel @ np.array([-model[3], model[2]]))
                    if r > residual_threshold:
                        continue
                members.add(nb)
                frontier.append(nb)
        if len(members) >= min_points:
            idx = np.array(sorted(members))
            pts = points[idx]
            model = _fit_plane_np(pts) if d == 3 else _fit_line_np(pts)
            patches.append(Patch(idx, model))
            assigned[idx] = True
    return patches
