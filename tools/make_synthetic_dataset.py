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
    args = ap.parse_args()

    from _common import scaled_camera
    from onepiece_tpu.geometry.camera import TUM_CAMERA
    from onepiece_tpu.io.tum import write_synthetic_tum

    cam = scaled_camera(TUM_CAMERA, args.scale)
    poses = write_synthetic_tum(args.out, num_frames=args.frames, camera=cam)
    print(f"wrote {args.frames} frames ({cam.width}x{cam.height}) to {args.out}")


if __name__ == "__main__":
    main()
