"""On-hardware numerics self-check for the production Pallas TSDF kernel.

The pytest suite runs under interpret=True on CPU (tests/conftest.py); this
script re-runs the bit-exactness claims on the REAL TPU through Mosaic
(interpret=False), where cast/rounding semantics could differ:

  1. f32 (2, H, W) [depth, gray] image path == pack_image_gray packed path
     bit-exactly (the in-kernel bf16 hi/lo depth split is the same
     arithmetic as the host pack).
  2. Mosaic vs interpret-mode integration of the same frame: weights exact,
     sdf within the bf16 hi/lo split tolerance.

Run: `python tools/tpu_selfcheck.py` (uses the default jax device).
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from onepiece_tpu.ops import tsdf as tsdf_ops
    from onepiece_tpu.ops import tsdf_pallas as tp

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    h, w = 480, 640
    fx = fy = 525.0
    cx, cy = 319.5, 239.5
    depth = (1.0 + rng.random((h, w)) * 2.0).astype(np.float32)
    gray = rng.random((h, w)).astype(np.float32)
    # blocks covering the camera frustum around 1-3 m
    bc = []
    for x in range(-8, 8):
        for y in range(-6, 6):
            for z in range(10, 22):
                bc.append((x, y, z))
    bc = np.asarray(bc[:1500], np.int32)
    nb = len(bc)
    keyspad = nb + (-nb) % 128

    def pack(c):
        cc = np.clip(c + 512, 0, 1023)
        return (cc[:, 0] << 20) | (cc[:, 1] << 10) | cc[:, 2]

    vox = np.zeros((nb + 1, 5, 512), np.float32)
    vox[:, 0] = tsdf_ops.EMPTY_SDF
    slots = np.full(keyspad, nb, np.int32)
    slots[:nb] = np.arange(nb)
    keys = np.zeros(keyspad, np.int32)
    keys[:nb] = pack(bc)
    T_cw = np.eye(4, dtype=np.float32)

    def run(img, interpret):
        return np.asarray(
            tp.integrate_slots_pallas(
                jnp.asarray(vox), jnp.asarray(keys), jnp.asarray(slots),
                img, jnp.asarray(T_cw), fx, fy, cx, cy, 0.0125, 0.1,
                interpret=interpret,
            )
        )

    img_f32 = jnp.stack([jnp.asarray(depth), jnp.asarray(gray)])
    img_pack = tp.pack_image_gray(jnp.asarray(depth), jnp.asarray(gray))

    out_f32 = run(img_f32, interpret=False)
    out_pack = run(img_pack, interpret=False)
    updated = (out_f32[:nb, 1] > 0).sum()
    assert updated > 10000, f"fixture must exercise real updates, got {updated}"
    if np.array_equal(out_f32, out_pack):
        print(f"PASS f32-vs-packed bit-exact on hardware ({updated} voxels updated)")
    else:
        d = np.abs(out_f32 - out_pack)
        print(f"FAIL f32-vs-packed: max diff {d.max()} at channel {np.unravel_index(d.argmax(), d.shape)}")
        sys.exit(1)

    out_interp = run(img_pack, interpret=True)
    w_ok = np.array_equal(out_interp[:nb, 1], out_pack[:nb, 1])
    sdf_d = np.abs(out_interp[:nb, 0] - out_pack[:nb, 0]).max()
    col_d = np.abs(out_interp[:nb, 2:5] - out_pack[:nb, 2:5]).max()
    print(f"mosaic-vs-interpret: weights exact={w_ok} sdf max|d|={sdf_d:.2e} color max|d|={col_d:.2e}")
    assert w_ok and sdf_d < 5e-4, "Mosaic numerics drifted from interpret mode"
    print("PASS hardware self-check")


if __name__ == "__main__":
    main()
