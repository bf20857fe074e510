#!/usr/bin/env python
"""ReadPLY / ReadRGBD: inspect meshes, point clouds, and RGB-D frames.

CLI rebuild of ref example/{ReadPLYMESH,ReadPLYPCD,ReadRGBD}.cpp — load the
file, print a summary (and optional derived stats), optionally re-write it
(round-trip check) or render a headless preview PNG.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["mesh", "pcd", "rgbd"])
    ap.add_argument("input", help="PLY path (mesh/pcd) or depth PNG (rgbd)")
    ap.add_argument("--rgb", default="", help="rgb image for rgbd mode")
    ap.add_argument("--rewrite", default="", help="round-trip write to this path")
    ap.add_argument("--preview", default="", help="render preview PNG here")
    ap.add_argument("--camera", default="tum")
    args = ap.parse_args()

    from onepiece_tpu.io.ply import read_ply, write_ply_mesh

    if args.cmd in ("mesh", "pcd"):
        data = read_ply(args.input)
        v = data["vertices"]
        f = data.get("faces")
        print(f"vertices: {len(v)}  bbox {v.min(0).round(3)} .. {v.max(0).round(3)}")
        if data.get("colors") is not None:
            print(f"colors:   yes ({data['colors'].dtype})")
        if data.get("normals") is not None:
            print(f"normals:  yes")
        if args.cmd == "mesh":
            nf = 0 if f is None else len(f)
            print(f"faces:    {nf}")
            if nf:
                e = v[f[:, 1]] - v[f[:, 0]]
                e2 = v[f[:, 2]] - v[f[:, 0]]
                area = 0.5 * np.linalg.norm(np.cross(e, e2), axis=-1).sum()
                print(f"surface area: {area:.4f} m^2")
        if args.rewrite:
            write_ply_mesh(
                args.rewrite, v,
                f if f is not None else np.zeros((0, 3), np.int32),
                data.get("colors"), data.get("normals"),
            )
            back = read_ply(args.rewrite)
            assert np.allclose(back["vertices"], v, atol=1e-6)
            print(f"round-trip ok -> {args.rewrite}")
        if args.preview:
            from onepiece_tpu.geometry.camera import PRESETS
            from onepiece_tpu.viz.render import save_mesh_png

            cam = PRESETS[args.camera]
            center = v.mean(0)
            T = np.eye(4)
            T[:3, 3] = center + np.array([0, 0, -2.0 * max(1e-3, v.std())])
            save_mesh_png(args.preview, v, f, cam, T, data.get("colors"))
            print(f"preview -> {args.preview}")
        return

    # rgbd: depth (+ optional rgb) -> stats + backprojected cloud
    import imageio.v3 as iio
    import jax.numpy as jnp

    from onepiece_tpu.geometry.camera import PRESETS
    from onepiece_tpu.geometry.pointcloud import PointCloud

    cam = PRESETS[args.camera]
    depth_raw = iio.imread(args.input)
    depth = depth_raw.astype(np.float32) / cam.depth_scale
    valid = depth > 0
    print(f"depth: {depth.shape} valid {valid.mean() * 100:.1f}% "
          f"range [{depth[valid].min():.3f}, {depth[valid].max():.3f}] m")
    rgb = None
    if args.rgb:
        rgb = iio.imread(args.rgb).astype(np.float32) / 255.0
        print(f"rgb:   {rgb.shape}")
    cloud = PointCloud.from_rgbd(
        jnp.asarray(depth), None if rgb is None else jnp.asarray(rgb), cam
    )
    pts, nrms, cols = cloud.to_numpy()
    print(f"backprojected cloud: {len(pts)} points")
    if args.rewrite:
        from onepiece_tpu.io.ply import write_ply_pointcloud

        write_ply_pointcloud(args.rewrite, pts, colors=cols if args.rgb else None)
        print(f"cloud -> {args.rewrite}")


if __name__ == "__main__":
    main()
