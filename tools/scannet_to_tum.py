#!/usr/bin/env python
"""ScannetToTum: convert a ScanNet export to TUM dataset layout.

CLI wrapper over io/scannet.py:scannet_to_tum
(ref: example/ScannetToTum.cpp).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="ScanNet export dir (with _info.txt)")
    ap.add_argument("out", help="output TUM-format dir")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    from onepiece_tpu.io.scannet import scannet_to_tum

    scannet_to_tum(args.root, args.out, args.max_frames)
    print(f"TUM dataset -> {args.out}")


if __name__ == "__main__":
    main()
