#!/usr/bin/env python
"""Render the synthetic scene into an on-disk TUM-format dataset.

Gives every tool (ours AND the reference CPU binaries used for baseline
measurement) a common dataset, since this environment ships no TUM data.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", type=str)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument(
        "--corrupt", action="store_true",
        help="apply the sensor model (depth noise + holes + gray noise)",
    )
    ap.add_argument(
        "--textureless", type=str, default=None, metavar="K0:K1",
        help="collapse contrast on frames [K0, K1) (textureless segment)",
    )
    args = ap.parse_args()

    from _common import scaled_camera
    from onepiece_tpu.geometry.camera import TUM_CAMERA
    from onepiece_tpu.io.tum import write_synthetic_tum

    cam = scaled_camera(TUM_CAMERA, args.scale)
    tl = tuple(int(x) for x in args.textureless.split(":")) if args.textureless else None
    poses = write_synthetic_tum(
        args.out, num_frames=args.frames, camera=cam,
        corrupt=args.corrupt, textureless=tl,
    )
    tag = " (corrupted)" if args.corrupt else ""
    print(f"wrote {args.frames} frames ({cam.width}x{cam.height}){tag} to {args.out}")


if __name__ == "__main__":
    main()
