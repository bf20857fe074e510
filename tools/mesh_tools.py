#!/usr/bin/env python
"""Mesh utilities: simplify (QEM / clustering), prune, normals.

CLI rebuild of the reference's SimplifyMesh / SimplifyMeshQuadric /
PruneMesh / EstimateNormals examples (ref: CMakeLists.txt:159-190).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["simplify-quadric", "simplify-cluster", "prune", "normals", "info"])
    ap.add_argument("input")
    ap.add_argument("output", nargs="?", default="out.ply")
    ap.add_argument("--target-faces", type=int, default=10000)
    ap.add_argument("--cell-size", type=float, default=0.02)
    ap.add_argument("--min-faces", type=int, default=100)
    args = ap.parse_args()

    from onepiece_tpu.geometry.mesh import TriangleMesh

    mesh = TriangleMesh.read_ply(args.input)
    print(f"in: {len(mesh.vertices)} verts {len(mesh.faces)} faces")
    if args.cmd == "info":
        return
    if args.cmd == "simplify-quadric":
        out = mesh.quadric_simplify(args.target_faces)
    elif args.cmd == "simplify-cluster":
        out = mesh.clustering_simplify(args.cell_size)
    elif args.cmd == "prune":
        out = mesh.prune(args.min_faces)
    elif args.cmd == "normals":
        out = mesh.compute_vertex_normals()
    out.write_ply(args.output)
    print(f"out: {len(out.vertices)} verts {len(out.faces)} faces -> {args.output}")


if __name__ == "__main__":
    main()
