"""Long-sequence robustness run: 200+ frames around a CLOSED loop.

Exercises what the 16-frame bench cannot (VERDICT r2 weak #7): sustained
pool pressure with growth, keyframe-DB growth, genuine loop-closure firing
on the return leg, and pose-graph drift correction. Runs both production
systems on the same rendered sequence:

  1. FusedDenseFusion (dense VO + TSDF) in chunks, with `maybe_grow`
     between chunks;
  2. chunked FBASlam (sparse VO + MILD LC + pose-graph), reporting ATE
     before vs after optimisation and the LC edges that fired.

Writes LONGRUN.json (summary) and longrun_metrics.jsonl (per-chunk
metrics). Run on the TPU: `python tools/long_run.py [--frames 200]`.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--out", type=str, default="LONGRUN.json")
    ap.add_argument("--metrics", type=str, default="longrun_metrics.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepiece_tpu.utils import compile_cache

    compile_cache.enable()

    from onepiece_tpu.geometry.camera import TUM_CAMERA as cam
    from onepiece_tpu.io import trajectory as traj
    from onepiece_tpu.systems.fbaslam import FBASlam
    from onepiece_tpu.systems.fused_slam import FusedDenseFusion
    from onepiece_tpu.utils import synthetic

    n = args.frames
    scene = synthetic.default_scene()
    poses = synthetic.loop_trajectory(n)
    grays = []
    depths = []
    t0 = time.perf_counter()
    for i in range(n):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), cam.fx, cam.fy, cam.cx, cam.cy,
            cam.height, cam.width, num_steps=64,
        )
        grays.append(g)
        depths.append(d)
    grays = jnp.stack(grays)
    depths = jnp.stack(depths)
    jax.block_until_ready((grays, depths))
    print(f"rendered {n} frames in {time.perf_counter() - t0:.1f}s", flush=True)

    metrics = []

    # ---- 1. fused dense pipeline with pool growth --------------------------
    slam = FusedDenseFusion(cam, capacity=8192, table_size=1 << 15)
    t0 = time.perf_counter()
    grew = 0
    for s in range(0, n, args.chunk):
        slam.process_chunk(grays[s : s + args.chunk], depths[s : s + args.chunk])
        if slam.maybe_grow():
            grew += 1
        metrics.append(
            {
                "system": "fused", "frame": min(s + args.chunk, n),
                "active_blocks": slam.num_active, "capacity": slam.capacity,
                "overflow": slam.overflow,
            }
        )
        print(f"  fused {metrics[-1]}", flush=True)
    est, rmses = slam.finalize()
    dt = time.perf_counter() - t0
    fused_ate = float(traj.ate_rmse(est, poses))
    fused = {
        "fps": round(n / dt, 2), "ate_rmse_m": round(fused_ate, 5),
        "active_blocks": slam.num_active, "capacity": slam.capacity,
        "pool_growths": grew, "block_overflow": slam.overflow,
        "max_rmse": round(float(np.max(rmses)), 5),
    }
    print("fused:", fused, flush=True)
    assert slam.overflow == 0, "pool overflowed despite growth"

    # ---- 2. chunked sparse FBA with loop closure ---------------------------
    fba = FBASlam(cam)
    t0 = time.perf_counter()
    for s in range(0, n, args.chunk):
        g = np.asarray(grays[s : s + args.chunk])
        d = np.asarray(depths[s : s + args.chunk])
        fba.process_chunk(g, d)
        metrics.append(
            {
                "system": "fba", "frame": min(s + args.chunk, n),
                "keyframes": len(fba.keyframe_frames), "edges": len(fba.edges),
            }
        )
        print(f"  fba {metrics[-1]}", flush=True)
    dt = time.perf_counter() - t0
    est_fba = fba.trajectory()
    fba_ate = float(traj.ate_rmse(est_fba, poses))
    # loop edges = edges between non-consecutive keyframes
    loop_edges = sum(1 for e in fba.edges if e["dst"] - e["src"] > 1)
    sparse = {
        "fps": round(n / dt, 2), "ate_rmse_m": round(fba_ate, 5),
        "keyframes": len(fba.keyframe_frames), "edges": len(fba.edges),
        "loop_edges": loop_edges,
    }
    print("fba:", sparse, flush=True)

    with open(args.metrics, "w") as f:
        for m in metrics:
            f.write(json.dumps(m) + "\n")
    with open(args.out, "w") as f:
        json.dump({"frames": n, "fused": fused, "sparse_fba": sparse}, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out} + {args.metrics}")


if __name__ == "__main__":
    main()
