#!/usr/bin/env python
"""Roofline analysis of the hot kernels on the attached TPU chip.

BASELINE.md requires per-chip rooflines for the dense-odometry/ICP and TSDF
kernels. This measures steady-state kernel times and reports achieved
FLOP/s and HBM bandwidth against the chip's public peaks, plus the
arithmetic intensity that decides which roof applies.

Peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16 matmul,
~0.5 TFLOP/s-class per-lane f32 VPU throughput is not published — we report
against the HBM roof (819 GB/s), which is the binding constraint for every
kernel here (all are stencil/gather shaped, not matmul shaped).
"""

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBS = 819.0  # TPU v5e
BF16_TFLOPS = 197.0


def bench(fn, *args, n=10, **kw):
    import jax
    import numpy as _np

    def force(r):
        # block_until_ready under-measures through the remote-chip tunnel
        # (async completion is signalled before results land); fetching one
        # element forces true completion
        leaf = jax.tree.leaves(r)[0]
        _np.asarray(leaf).ravel()[:1]

    r = fn(*args, **kw)
    force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    force(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import onepiece_tpu  # noqa: F401  (compile cache)
    from onepiece_tpu.geometry.camera import TUM_CAMERA
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.ops import tsdf as tsdf_ops
    from onepiece_tpu.ops import warp as warp_ops
    from onepiece_tpu.registration import icp
    from onepiece_tpu.utils import synthetic

    cam = TUM_CAMERA
    h, w = cam.height, cam.width
    npx = h * w
    dev = jax.devices()[0]
    rows = []

    def report(name, seconds, flops, bytes_moved):
        ai = flops / max(bytes_moved, 1)
        gflops = flops / seconds / 1e9
        gbs = bytes_moved / seconds / 1e9
        rows.append(
            {
                "kernel": name,
                "time_ms": round(seconds * 1e3, 3),
                "gflop_per_s": round(gflops, 1),
                "hbm_gb_per_s": round(gbs, 1),
                "arith_intensity": round(ai, 2),
                "pct_hbm_roof": round(100 * gbs / HBM_GBS, 1),
            }
        )

    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(3)
    d0, g0 = synthetic.render(scene, jnp.eye(4), cam.fx, cam.fy, cam.cx, cam.cy, h, w, num_steps=64)
    d1, g1 = synthetic.render(scene, jnp.asarray(poses[1]), cam.fx, cam.fy, cam.cx, cam.cy, h, w, num_steps=64)
    p0 = dense.preprocess_frame(g0, d0, cam)
    p1 = dense.preprocess_frame(g1, d1, cam)

    # --- dense tracking: full 28-iteration multiscale GN -----------------
    t = bench(dense.dense_tracking, p0, p1, cam, n=10)
    # stencil taps dominate: (2r+1)^2 x 2 flops x 7 planes per pixel/iter,
    # + ~90 flops jacobian/reduction; traffic = stack+J planes ~ 26 f32/px/iter
    iters_px = 4 * npx + 8 * npx / 4 + 16 * npx / 16  # per-level iteration-pixels
    flops = iters_px * (81 * 2 * 7 + 90)
    bytes_moved = iters_px * 26 * 4
    report("dense_tracking (multiscale GN, 640x480)", t, flops, bytes_moved)

    # --- stencil sample alone at L0 --------------------------------------
    stack = jnp.zeros((6, h, w))
    sv = jnp.ones((h, w), bool)
    disp = jnp.zeros((2, h, w))
    t = bench(warp_ops.stencil_sample, stack, sv, disp, radius=4, n=10)
    report("stencil_sample r4 (6ch, 640x480)", t, npx * 81 * 2 * 7, npx * (7 + 8) * 4)

    # --- TSDF integrate: 4096-block launch -------------------------------
    B = 4096
    rng = np.random.default_rng(0)
    sdf = jnp.full((B, 512), 1.0)
    wgt = jnp.zeros((B, 512))
    col = jnp.zeros((B, 512, 3))
    coords = jnp.asarray(rng.integers(-8, 8, (B, 3)), jnp.int32)
    active = jnp.ones((B,), bool)
    rgb = jnp.zeros((h, w, 3))
    t = bench(
        tsdf_ops.integrate_blocks, sdf, wgt, col, coords, active, d0, rgb,
        jnp.eye(4), cam.fx, cam.fy, cam.cx, cam.cy, 0.0125, 0.1, n=10,
    )
    nvox = B * 512
    report("tsdf_integrate gather (4096 blocks)", t, nvox * 60, nvox * (8 * 4 + 16))

    t = bench(
        tsdf_ops.integrate_blocks_matmul, sdf, wgt, col, coords, active, d0, rgb,
        jnp.eye(4), cam.fx, cam.fy, cam.cx, cam.cy, 0.0125, 0.1, n=10,
    )
    # one-hot contractions dominate: V x rows x cols-ish window MACs
    report(
        "tsdf_integrate matmul (4096 blocks)", t,
        B * 512 * 128 * (128 + 4) * 2, nvox * (8 * 4 + 16) + B * 512 * 128 * 4 * 4,
    )

    # --- TSDF integrate: Pallas kernel (production path) ------------------
    from onepiece_tpu.ops import tsdf_pallas as tp

    c512 = np.asarray(coords) + 512
    keys = jnp.asarray(
        ((c512[:, 0] << 20) | (c512[:, 1] << 10) | c512[:, 2]).astype(np.int32)
    )
    slots = jnp.asarray(np.arange(B, dtype=np.int32))
    vox = tp.make_pool(B)
    img2 = jnp.stack([d0, g0])  # f32 production path: in-kernel hi/lo split
    t = bench(
        tp.integrate_slots_pallas, vox, keys, slots, img2, jnp.eye(4),
        cam.fx, cam.fy, cam.cx, cam.cy, 0.0125, 0.1, n=10,
    )
    # per block: 3 channel one-hot matmuls (WIN_R x WIN_C) @ (WIN_C x 512)
    report(
        "tsdf_integrate pallas (4096 blocks)", t,
        B * 3 * 2 * tp.WIN_R * tp.WIN_C * 512,
        B * (512 * 5 * 4 * 2) + 2 * h * w * 4,
    )

    # --- ICP iteration: brute-force NN over 20k x 20k --------------------
    pts = jnp.asarray(rng.normal(size=(20000, 3)), jnp.float32)
    valid = jnp.ones((20000,), bool)
    t = bench(icp.point_to_point, pts, valid, pts, valid, threshold=0.5, iters=5, n=3)
    # NN matmul dominates: iters x N x M x (2*3) flops
    flops = 5 * 20000 * 20000 * 6
    bytes_moved = 5 * (20000 * 20000 * 4)  # distance tiles
    report("icp point_to_point (20k pts, 5 iters)", t, flops, bytes_moved)

    # --- production fused frame step (track + allocate + integrate) ------
    from onepiece_tpu.systems import fused_slam as fs
    from onepiece_tpu.integration import device_hash as dh

    state = fs.fused_init_step(
        g0, d0, None, cam, 0.0125, 0.1, capacity=16384, table_size=1 << 16
    )
    state = state._replace(T_w=jnp.eye(4), rel=jnp.eye(4))

    def fused_step(gray, depth):
        nonlocal state
        state, out2 = fs.fused_frame_step(
            state, gray, depth, None, cam, 0.0125, 0.1, radii=(4, 3, 2)
        )
        return out2.T_w

    t = bench(fused_step, g1, d1, n=10)
    # traffic: pyramid build + tracking stacks + touched-key unique +
    # pallas integrate (~7k blocks) — report as whole-frame wall numbers
    report(
        "fused_frame_step (track+alloc+fuse, 640x480)", t,
        (4 * npx + 2 * npx) * (25 * 2 * 7 + 90) + 7200 * 3 * 2 * tp.WIN_R * tp.WIN_C * 512 // 4096,
        (4 * npx + 2 * npx) * 26 * 4 + 7200 * 512 * 5 * 4 * 2,
    )

    out = {
        "device": str(dev),
        "hbm_roof_gbs": HBM_GBS,
        "notes": (
            "Timed with a forced one-element fetch per call (block_until_ready "
            "under-reports through the remote-chip tunnel). Standalone micro-"
            "kernel rows therefore include ~2-15 ms of per-dispatch tunnel "
            "overhead, which dominates sub-10ms kernels; the production "
            "number is fused_frame_step (one dispatch for track+alloc+fuse, "
            "matches bench.py's ~23 ms/frame wall). All kernels are "
            "stencil/gather shaped: the HBM roof is the relevant bound; the "
            "one-hot MC/TSDF contractions ride the MXU by design but their "
            "FLOPs are incidental."
        ),
        "kernels": rows,
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(f"device: {dev}; HBM roof {HBM_GBS} GB/s")
        for r in rows:
            print(
                f"{r['kernel']:45s} {r['time_ms']:8.2f} ms  "
                f"{r['gflop_per_s']:8.1f} GF/s  {r['hbm_gb_per_s']:7.1f} GB/s  "
                f"AI {r['arith_intensity']:6.2f}  {r['pct_hbm_roof']:5.1f}% of HBM roof"
            )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ROOFLINE.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
