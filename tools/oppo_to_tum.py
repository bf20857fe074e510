#!/usr/bin/env python
"""Convert an Oppo-format capture to TUM layout (ref: example/OppoToTum.cpp).

Format (per the reference): `_info.txt` holds the frame count; frames are
`rgbNNNN.png` (1920x1080 color, center-cropped to 960x540) and `dNNNN.png`
(uint16 depth, scale 1000).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input_folder")
    ap.add_argument("output_folder")
    args = ap.parse_args()

    import cv2

    with open(os.path.join(args.input_folder, "_info.txt")) as f:
        n = int(f.read().split()[0])
    os.makedirs(os.path.join(args.output_folder, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.output_folder, "depth"), exist_ok=True)
    assoc = []
    for i in range(n):
        rgb = cv2.imread(os.path.join(args.input_folder, f"rgb{i:04d}.png"))
        depth = cv2.imread(os.path.join(args.input_folder, f"d{i:04d}.png"), cv2.IMREAD_UNCHANGED)
        if rgb is None or depth is None:
            print(f"missing frame {i}, stopping")
            break
        # center-crop color to the depth FoV (ref OppoToTum.cpp roi 480,270,960,540)
        if rgb.shape[:2] == (1080, 1920):
            rgb = rgb[270 : 270 + 540, 480 : 480 + 960]
        ts = i / 30.0
        rn, dn = f"rgb/{ts:.6f}.png", f"depth/{ts:.6f}.png"
        cv2.imwrite(os.path.join(args.output_folder, rn), rgb)
        cv2.imwrite(os.path.join(args.output_folder, dn), depth.astype(np.uint16))
        assoc.append(f"{ts:.6f} {rn} {ts:.6f} {dn}")
    with open(os.path.join(args.output_folder, "associate.txt"), "w") as f:
        f.write("\n".join(assoc) + "\n")
    print(f"converted {len(assoc)} frames -> {args.output_folder}")
    print("intrinsics (ref): fx=914.494 fy=914.378 cx=479.033 cy=274.493, 960x540, scale 1000")


if __name__ == "__main__":
    main()
