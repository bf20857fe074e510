"""ScanNet-format sequence IO.

Rebuild of the reference's ScanNet readers (ref: src/Tool/IO.cpp:109+
`ReadImageSequenceFromScannet*`): parses the exported `_info.txt`
(m_calibrationDepthIntrinsic, m_depthShift, frame count) plus per-frame
`frame-XXXXXX.color.jpg` / `.depth.pgm` / `.pose.txt` files, and the
color->depth alignment helper (ref: IO.cpp:9-58 `AlignColorToDepth`).
Also a TUM converter (ref: example/ScannetToTum.cpp).
"""

from __future__ import annotations

import os

import numpy as np

from ..geometry.camera import PinholeCamera


def read_info(path: str) -> dict:
    """Parse a ScanNet `_info.txt` into a dict."""
    out: dict = {}
    with open(path) as f:
        for line in f:
            if "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def camera_from_info(info: dict, depth: bool = True) -> PinholeCamera:
    key = "m_calibrationDepthIntrinsic" if depth else "m_calibrationColorIntrinsic"
    vals = [float(x) for x in info[key].split()]
    m = np.array(vals).reshape(4, 4)
    w = int(info["m_depthWidth" if depth else "m_colorWidth"])
    h = int(info["m_depthHeight" if depth else "m_colorHeight"])
    shift = float(info.get("m_depthShift", 1000.0))
    return PinholeCamera(fx=m[0, 0], fy=m[1, 1], cx=m[0, 2], cy=m[1, 2],
                         width=w, height=h, depth_scale=shift)


class ScanNetSequence:
    """Iterates (frame_idx, rgb (H, W, 3) uint8, depth (H, W) f32 m, pose (4, 4))."""

    def __init__(self, root: str, max_frames: int | None = None):
        self.root = root
        self.info = read_info(os.path.join(root, "_info.txt"))
        self.camera = camera_from_info(self.info, depth=True)
        self.color_camera = camera_from_info(self.info, depth=False)
        n = int(self.info.get("m_frames.size", 0))
        self.num_frames = min(n, max_frames) if max_frames else n

    def __len__(self):
        return self.num_frames

    def __getitem__(self, i: int):
        import cv2

        base = os.path.join(self.root, f"frame-{i:06d}")
        bgr = cv2.imread(base + ".color.jpg", cv2.IMREAD_COLOR)
        rgb = bgr[:, :, ::-1].copy() if bgr is not None else None
        d = cv2.imread(base + ".depth.pgm", cv2.IMREAD_UNCHANGED)
        depth = d.astype(np.float32) / self.camera.depth_scale
        pose = np.loadtxt(base + ".pose.txt").reshape(4, 4)
        if rgb is not None and rgb.shape[:2] != depth.shape:
            rgb = align_color_to_depth(rgb, self.color_camera, self.camera)
        return i, rgb, depth, pose


def align_color_to_depth(rgb: np.ndarray, color_cam: PinholeCamera, depth_cam: PinholeCamera) -> np.ndarray:
    """Resample the color image onto the depth camera's pixel grid.

    (ref: IO.cpp:9-58 `AlignColorToDepth` — same-extrinsics intrinsic
    rescale, which is what the reference implements.)
    """
    import cv2

    h, w = depth_cam.height, depth_cam.width
    u = (np.arange(w) - depth_cam.cx) / depth_cam.fx * color_cam.fx + color_cam.cx
    v = (np.arange(h) - depth_cam.cy) / depth_cam.fy * color_cam.fy + color_cam.cy
    map_u, map_v = np.meshgrid(u.astype(np.float32), v.astype(np.float32))
    return cv2.remap(rgb, map_u, map_v, cv2.INTER_LINEAR)


def scannet_to_tum(root: str, out: str, max_frames: int | None = None) -> None:
    """Convert a ScanNet export to TUM layout (ref: example/ScannetToTum.cpp)."""
    import cv2

    seq = ScanNetSequence(root, max_frames)
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    from scipy.spatial.transform import Rotation

    for i in range(len(seq)):
        _, rgb, depth, pose = seq[i]
        ts = i / 30.0
        cv2.imwrite(os.path.join(out, f"rgb/{ts:.6f}.png"), rgb[:, :, ::-1])
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(out, f"depth/{ts:.6f}.png"), d16)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        q = Rotation.from_matrix(pose[:3, :3]).as_quat()
        t = pose[:3, 3]
        gt_lines.append(
            f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} {q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines), ("groundtruth.txt", gt_lines)):
        with open(os.path.join(out, name), "w") as f:
            f.write("# converted from scannet\n" + "\n".join(lines) + "\n")


def read_instance_info(root: str) -> tuple[np.ndarray, list[str]]:
    """ScanNet instance labels: per-mesh-vertex object id (-1 unlabelled).

    Parses `<scene>_vh_clean.segs.json` (segIndices: vertex -> segment) and
    `<scene>_vh_clean.aggregation.json` (segGroups: object -> segments,
    label) and composes them, exactly the reference's
    `ReadIntanceInfoFromScannet` (ref: src/Tool/IO.cpp:199-309).
    Returns (point2object (V,) int32, object names).
    """
    import json as _json

    scene = os.path.basename(os.path.normpath(root))
    with open(os.path.join(root, scene + "_vh_clean.segs.json")) as f:
        point2segment = np.asarray(_json.load(f)["segIndices"], np.int64)
    with open(os.path.join(root, scene + "_vh_clean.aggregation.json")) as f:
        groups = _json.load(f)["segGroups"]
    names = [g.get("label", "") for g in groups]
    segment2object: dict[int, int] = {}
    for oid, g in enumerate(groups):
        for seg in g["segments"]:
            segment2object[int(seg)] = oid
    point2object = np.full(len(point2segment), -1, np.int32)
    for i, seg in enumerate(point2segment):
        point2object[i] = segment2object.get(int(seg), -1)
    return point2object, names
