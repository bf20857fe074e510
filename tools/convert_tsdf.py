#!/usr/bin/env python
"""Convert TSDF volumes between the npz checkpoint format and the C++
reference's binary cube format (ref: CubeHandler.h:40-128), enabling
cross-validation against reference-produced volumes and the
MergeMultipleSubmaps workflow (ref: example/MergeMultipleSubmaps.cpp:34-42).

Usage:
  python tools/convert_tsdf.py volume.npz out.cube        # npz -> reference
  python tools/convert_tsdf.py ref.cube out.npz           # reference -> npz
  python tools/convert_tsdf.py ref.cube mesh.ply          # reference -> mesh
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--voxel", type=float, default=0.0125)
    ap.add_argument("--truncation", type=float, default=0.1)
    args = ap.parse_args()

    from onepiece_tpu.integration.volume_ops import load_volume, save_volume
    from onepiece_tpu.io.ref_tsdf import read_ref_tsdf, write_ref_tsdf

    if args.src.endswith(".npz"):
        vol = load_volume(args.src)
    else:
        vol = read_ref_tsdf(args.src, args.voxel, args.truncation)
    print(f"loaded {vol.num_active} blocks from {args.src}")

    if args.dst.endswith(".npz"):
        save_volume(vol, args.dst)
    elif args.dst.endswith(".ply"):
        from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh

        tv, tc = vol.extract_mesh()
        verts, faces, cols = dedup_triangle_soup(tv, tc)
        write_ply_mesh(args.dst, verts, faces, colors=cols)
        print(f"mesh: {len(verts)} verts {len(faces)} faces")
    else:
        write_ref_tsdf(args.dst, vol)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
