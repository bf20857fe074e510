"""Wavefront OBJ mesh IO (ref: src/Tool/OBJManager.{h,cpp}, tinyobjloader)."""

from __future__ import annotations

import numpy as np


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
              normals: np.ndarray | None = None) -> None:
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if normals is not None:
            for n in normals:
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for tri in faces:
            a, b, c = tri + 1
            if normals is not None:
                f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")
            else:
                f.write(f"f {a} {b} {c}\n")


def read_obj(path: str) -> dict:
    verts, normals, faces = [], [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(x) for x in p[1:4]])
            elif p[0] == "vn":
                normals.append([float(x) for x in p[1:4]])
            elif p[0] == "f":
                idx = [int(tok.split("/")[0]) - 1 for tok in p[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate polygons
                    faces.append([idx[0], idx[k], idx[k + 1]])
    out = {
        "vertices": np.asarray(verts, np.float32),
        "faces": np.asarray(faces, np.int64) if faces else np.zeros((0, 3), np.int64),
    }
    if normals:
        out["normals"] = np.asarray(normals, np.float32)
    return out
