#!/usr/bin/env python
"""Live-capture driver: consume a LiveRGBDReader stream into the fused SLAM
pipeline and archive the frames.

Rebuild of ref example/AcquireLiveData.cpp: the reference grabs OpenNI2
frames in a loop and writes them to disk. Here the stream comes from any
`io.openni.LiveRGBDReader` backend — in this offline environment, the
sensor-rate `ReplayRGBDReader` — and frames are both archived (TUM layout)
and fed live into FusedDenseFusion in micro-chunks.

Usage: python tools/acquire_live_data.py --replay data/synth_tum --frames 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replay", type=str, required=True, help="TUM dir to replay as a live stream")
    ap.add_argument("--rate", type=float, default=30.0)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--out", type=str, default="", help="archive captured frames to this dir")
    ap.add_argument("--chunk", type=int, default=4)
    args = ap.parse_args()

    import imageio.v2 as iio
    import jax.numpy as jnp

    from onepiece_tpu.io.openni import ReplayRGBDReader
    from onepiece_tpu.io.tum import TumSequence  # noqa: F401 (format docs)
    from onepiece_tpu.systems.fused_slam import FusedDenseFusion

    reader = ReplayRGBDReader(args.replay, rate_hz=args.rate, max_frames=args.frames)
    assert reader.init(), "no frames in replay source"

    if args.out:
        os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)

    # camera from the replayed sequence's convention (TUM default)
    from onepiece_tpu.geometry.camera import TUM_CAMERA as cam

    slam = FusedDenseFusion(cam)
    buf_g, buf_d = [], []
    n = 0
    t0 = time.perf_counter()
    while True:
        item = reader.get_next_rgbd()
        if item is None:
            break
        ts, rgb, depth = item
        gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]) / 255.0
        buf_g.append(gray.astype(np.float32))
        buf_d.append(np.asarray(depth, np.float32))
        if args.out:
            iio.imwrite(os.path.join(args.out, "rgb", f"{ts:.6f}.png"), rgb)
            iio.imwrite(
                os.path.join(args.out, "depth", f"{ts:.6f}.png"),
                (np.asarray(depth) * 5000.0).astype(np.uint16),
            )
        n += 1
        if len(buf_g) >= args.chunk:
            slam.process_chunk(jnp.asarray(np.stack(buf_g)), jnp.asarray(np.stack(buf_d)))
            buf_g, buf_d = [], []
    if buf_g:
        slam.process_chunk(jnp.asarray(np.stack(buf_g)), jnp.asarray(np.stack(buf_d)))
    poses, rmses = slam.finalize()
    dt = time.perf_counter() - t0
    reader.close()
    print(
        f"captured {n} frames at {args.rate} Hz in {dt:.1f}s; "
        f"tracked rmse max {float(np.max(rmses)):.4f}; blocks {slam.num_active}"
    )


if __name__ == "__main__":
    main()
