"""Stage-level latency breakdown of the fused sparse chunk.

Times, on the real chip: (a) dispatch+fetch floor (trivial program),
(b) 16-frame batched extraction alone, (c) one tracking step alone,
(d) the full fused chunk, (e) the chunk minus LC/pose-graph stages.
Prints one JSON dict; used to attribute the sparse frame budget before
optimising (VERDICT r4 weak #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onepiece_tpu.utils import compile_cache

compile_cache.enable()

from onepiece_tpu.geometry.camera import TUM_CAMERA
from onepiece_tpu.odometry import sparse
from onepiece_tpu.systems import fused_sparse
from onepiece_tpu.utils import synthetic


def timeit(fn, n=10, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn())
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return best * 1e3


def main():
    cam = TUM_CAMERA
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(16)
    frames = [
        synthetic.render(scene, jnp.asarray(poses[i]), cam.fx, cam.fy,
                         cam.cx, cam.cy, cam.height, cam.width, num_steps=64)
        for i in range(16)
    ]
    grays = jnp.stack([g for _, g in frames])
    depths = jnp.stack([d for d, _ in frames])
    jax.block_until_ready((grays, depths))

    out = {}

    # (a) dispatch + fetch floor
    @jax.jit
    def trivial(x):
        return x + 1.0

    x0 = jnp.zeros((8,), jnp.float32)
    out["dispatch_fetch_ms"] = timeit(lambda: jax.device_get(trivial(x0)))

    # (b) batched extraction, one dispatch
    def extract():
        fr = sparse.extract_sparse_frames_batch(grays, depths, cam,
                                                max_keypoints=1000,
                                                threshold=0.01)
        return fr.points

    out["extract16_ms"] = timeit(extract)

    # (b2) single-frame extraction
    def extract1():
        fr = sparse.extract_sparse_frame(grays[0], depths[0], cam,
                                         max_keypoints=1000, threshold=0.01)
        return fr.points

    out["extract1_ms"] = timeit(extract1)

    # (c) one tracking step (match+RanSaPC+RANSAC x2 + summary)
    f0 = sparse.extract_sparse_frame(grays[0], depths[0], cam,
                                     max_keypoints=1000, threshold=0.01)
    f1 = sparse.extract_sparse_frame(grays[1], depths[1], cam,
                                     max_keypoints=1000, threshold=0.01)
    key = jax.random.PRNGKey(0)

    def track1():
        res, summ = sparse.sparse_tracking_with_summary(f0, f1, cam, key)
        return summ.T_ts

    out["track1_ms"] = timeit(track1)

    # (c2) 16 pair tracks in one dispatch (lax.map)
    fs = jax.tree.map(lambda a: jnp.stack([a] * 16), f0)
    ft = jax.tree.map(lambda a: jnp.stack([a] * 16), f1)
    keys = jax.random.split(key, 16)

    def track16():
        res, summ = sparse.track_pairs_batch(keys, fs, ft, cam)
        return summ.T_ts

    out["track16_map_ms"] = timeit(track16, n=5)

    # (d) full fused chunk
    def full_chunk():
        s = fused_sparse.FusedFBASlam(cam)
        s.process_chunk(grays, depths)
        return s

    full_chunk()  # warm
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        full_chunk()
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    out["full_chunk16_ms"] = best * 1e3

    out["derived"] = {
        "extract_per_frame_ms": round(out["extract16_ms"] / 16, 3),
        "track_per_frame_map_ms": round(out["track16_map_ms"] / 16, 3),
        "chunk_minus_extract_track_ms": round(
            out["full_chunk16_ms"] - out["extract16_ms"] - out["track16_map_ms"], 2
        ),
        "fps_now": round(16.0 / (out["full_chunk16_ms"] / 1e3), 1),
    }
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
