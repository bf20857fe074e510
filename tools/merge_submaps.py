#!/usr/bin/env python
"""Merge multiple TSDF submap checkpoints under per-submap poses.

CLI rebuild of ref example/MergeMultipleSubmaps.cpp:34-42: loads submap
volumes (volume_ops.save_volume format), rigidly transforms each into the
global frame, merges voxel-wise, extracts the final mesh.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("volumes", nargs="+", help="submap .npz files")
    ap.add_argument("--trajectory", required=True,
                    help="16-float-row poses, one per submap (world-from-submap)")
    ap.add_argument("--out-mesh", default="merged.ply")
    ap.add_argument("--out-volume", default="")
    args = ap.parse_args()

    from onepiece_tpu.integration import volume_ops
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.io.ply import dedup_triangle_soup, write_ply_mesh

    poses = traj.read_matrix_trajectory(args.trajectory)
    assert len(poses) >= len(args.volumes), "need one pose per submap"

    merged = None
    for i, path in enumerate(args.volumes):
        vol = volume_ops.load_volume(path)
        print(f"submap {i}: {vol.num_active} blocks")
        moved = volume_ops.transform_volume(vol, poses[i])
        merged = moved if merged is None else volume_ops.merge_volumes(merged, moved)
    print(f"merged: {merged.num_active} blocks")

    if args.out_volume:
        volume_ops.save_volume(merged, args.out_volume)
    tv, tc = merged.extract_mesh()
    verts, faces, cols = dedup_triangle_soup(tv, tc)
    write_ply_mesh(args.out_mesh, verts, faces, colors=cols)
    print(f"mesh: {len(verts)} verts {len(faces)} faces -> {args.out_mesh}")


if __name__ == "__main__":
    main()
