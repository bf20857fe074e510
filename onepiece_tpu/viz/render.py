"""Offline visualisation: debug image dumps and a software mesh renderer.

Replacement for the reference's Pangolin/OpenGL visualizer (ref:
src/Visualization/Visualizer.{h,cpp}) and cv::Mat debug draws (ref:
src/Visualization/DrawImage.h). A GL window is a non-goal in this headless
environment; parity is provided by matplotlib image dumps plus a simple
z-buffered software rasteriser for meshes/clouds so every pipeline can emit
inspection PNGs.
"""

from __future__ import annotations

import numpy as np


def save_depth_png(path: str, depth: np.ndarray, max_depth: float = 4.0) -> None:
    """Rainbow depth visualisation (ref DrawImage depth rainbow)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = np.asarray(depth)
    masked = np.ma.masked_where(d <= 0, d)
    plt.figure(figsize=(8, 6))
    plt.imshow(masked, cmap="turbo", vmin=0, vmax=max_depth)
    plt.colorbar(label="depth [m]")
    plt.axis("off")
    plt.savefig(path, bbox_inches="tight", dpi=100)
    plt.close()


def save_gray_png(path: str, gray: np.ndarray) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 6))
    plt.imshow(np.asarray(gray), cmap="gray")
    plt.axis("off")
    plt.savefig(path, bbox_inches="tight", dpi=100)
    plt.close()


def save_trajectory_png(path: str, poses: np.ndarray, gt: np.ndarray | None = None) -> None:
    """Top-down (x-z) trajectory plot with optional ground truth."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = np.asarray(poses)[:, :3, 3]
    plt.figure(figsize=(6, 6))
    plt.plot(p[:, 0], p[:, 2], "b-", label="estimate")
    if gt is not None:
        g = np.asarray(gt)[:, :3, 3]
        plt.plot(g[:, 0], g[:, 2], "g--", label="ground truth")
    plt.axis("equal")
    plt.legend()
    plt.xlabel("x [m]")
    plt.ylabel("z [m]")
    plt.savefig(path, bbox_inches="tight", dpi=100)
    plt.close()


def render_mesh(
    vertices: np.ndarray,  # (V, 3)
    faces: np.ndarray,  # (F, 3)
    camera,  # PinholeCamera
    T_wc: np.ndarray,  # camera-to-world
    colors: np.ndarray | None = None,  # (V, 3) in [0, 1]
    light_dir=(0.3, -0.5, -0.8),
) -> np.ndarray:
    """Z-buffered flat-shaded software rasteriser -> (H, W, 3) float image.

    Replaces the reference's phong GL draw (ref Visualizer.cpp:148
    `DrawPhongRendering`) for headless inspection. Vectorised per-face
    bounding-box rasterisation in numpy; fine for offline dumps.
    """
    h, w = camera.height, camera.width
    T_cw = np.linalg.inv(T_wc)
    vc = vertices @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = vc[:, 2]
    valid_v = z > 1e-6
    u = vc[:, 0] / np.clip(z, 1e-6, None) * camera.fx + camera.cx
    v = vc[:, 1] / np.clip(z, 1e-6, None) * camera.fy + camera.cy

    img = np.zeros((h, w, 3), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    ld = np.asarray(light_dir, np.float64)
    ld /= np.linalg.norm(ld)

    fn = np.cross(
        vertices[faces[:, 1]] - vertices[faces[:, 0]],
        vertices[faces[:, 2]] - vertices[faces[:, 0]],
    )
    fl = np.linalg.norm(fn, axis=-1)
    ok_f = fl > 1e-12
    fn[ok_f] = fn[ok_f] / fl[ok_f][:, None]
    # double-sided lighting: marching-cubes face orientation is arbitrary
    # per sign convention, and one-sided shading blacks out half the mesh
    shade = 0.3 + 0.7 * np.abs(fn @ ld)

    if colors is None:
        base = np.full((len(faces), 3), 0.7)
    else:
        base = colors[faces].mean(axis=1)

    for fi, tri in enumerate(faces):
        if not ok_f[fi] or not valid_v[tri].all():
            continue
        tu, tv, tz = u[tri], v[tri], z[tri]
        x0, x1 = int(max(np.floor(tu.min()), 0)), int(min(np.ceil(tu.max()), w - 1))
        y0, y1 = int(max(np.floor(tv.min()), 0)), int(min(np.ceil(tv.max()), h - 1))
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        # barycentric coords
        d = (tv[1] - tv[2]) * (tu[0] - tu[2]) + (tu[2] - tu[1]) * (tv[0] - tv[2])
        if abs(d) < 1e-12:
            continue
        l0 = ((tv[1] - tv[2]) * (xs - tu[2]) + (tu[2] - tu[1]) * (ys - tv[2])) / d
        l1 = ((tv[2] - tv[0]) * (xs - tu[2]) + (tu[0] - tu[2]) * (ys - tv[2])) / d
        l2 = 1 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not inside.any():
            continue
        zi = 1.0 / (l0 / tz[0] + l1 / tz[1] + l2 / tz[2])
        sub_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        upd = inside & (zi < sub_z)
        sub_z[upd] = zi[upd]
        img[y0 : y1 + 1, x0 : x1 + 1][upd] = base[fi] * shade[fi]
    return img


def save_mesh_png(path: str, vertices, faces, camera, T_wc, colors=None) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = render_mesh(vertices, faces, camera, np.asarray(T_wc), colors)
    plt.figure(figsize=(8, 6))
    plt.imshow(np.clip(img, 0, 1))
    plt.axis("off")
    plt.savefig(path, bbox_inches="tight", dpi=100)
    plt.close()
