#!/usr/bin/env python
"""Cross-validate io/ref_tsdf.py against the REFERENCE'S OWN C++ reader
and writer (bench_reference/ref_tsdf_check, compiled from the reference's
unmodified sources):

  1. Python writes a random volume in the reference binary cube format.
  2. The reference's CubeHandler::ReadFromFile loads it and prints content
     checksums (cube count, voxel count, id/sdf/weight/color sums), which
     must match the Python-side ground truth.
  3. The reference's WriteToFile writes the volume back out; Python
     re-reads that file and asserts voxel-exact equality with the
     original — a full Python -> C++ -> Python round trip through the
     reference's code.

Build the checker once:
  cd bench_reference/build && cmake .. && make ref_tsdf_check
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onepiece_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()


def main() -> int:
    import jax.numpy as jnp

    from onepiece_tpu.integration.blocks import TSDFVolume
    from onepiece_tpu.io.ref_tsdf import read_ref_tsdf, write_ref_tsdf

    checker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_reference", "build", "ref_tsdf_check",
    )
    if not os.path.exists(checker):
        print(f"checker not built: {checker} (see module docstring)")
        return 2

    rng = np.random.default_rng(7)
    n = 8
    nblocks = 6
    vol = TSDFVolume(voxel_size=0.02, truncation=0.1, capacity=8)
    sdf = np.full((8, n, n, n), 999.0, np.float32)
    wgt = np.zeros((8, n, n, n), np.float32)
    col = np.zeros((8, n, n, n, 3), np.float32)
    coords = np.unique(rng.integers(-30, 30, (nblocks, 3)), axis=0).astype(np.int64)
    for b in range(len(coords)):
        mask = rng.random((n, n, n)) < 0.4
        sdf[b][mask] = rng.uniform(-0.99, 0.99, mask.sum()).astype(np.float32)
        wgt[b][mask] = rng.uniform(1.0, 40.0, mask.sum()).astype(np.float32)
        col[b][mask] = rng.uniform(0.0, 1.0, (mask.sum(), 3)).astype(np.float32)
    vol.sdf = jnp.asarray(sdf)
    vol.weight = jnp.asarray(wgt)
    vol.color = jnp.asarray(col)
    vol.block_coords[: len(coords)] = coords
    vol.slot_of = {tuple(c): i for i, c in enumerate(coords.tolist())}
    vol.num_active = len(coords)

    written = (np.abs(sdf) < 1.0) & (wgt != 0)
    written[len(coords):] = False
    expect = {
        "cubes": len(coords),
        "voxels": int(written.sum()),
        "id_sum": int(coords.sum()),
        "sdf_sum": float(sdf[written].astype(np.float64).sum()),
        "w_sum": float(wgt[written].astype(np.float64).sum()),
        "c_sum": float(col[written].astype(np.float64).sum()),
    }

    with tempfile.TemporaryDirectory() as td:
        p_in = os.path.join(td, "py.cube")
        p_out = os.path.join(td, "cpp.cube")
        write_ref_tsdf(p_in, vol)
        out = subprocess.run(
            [checker, p_in, p_out], capture_output=True, text=True, timeout=120
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("cubes ")][0]
        print("reference reader:", line)
        tok = line.split()
        got = {
            "cubes": int(tok[1]), "voxels": int(tok[3]), "id_sum": int(tok[5]),
            "sdf_sum": float(tok[7]), "w_sum": float(tok[9]), "c_sum": float(tok[11]),
        }
        for k, v in expect.items():
            g = got[k]
            ok = (abs(g - v) < 1e-3 * max(1.0, abs(v))) if isinstance(v, float) else g == v
            print(f"  {k}: python {v}  reference {g}  {'OK' if ok else 'MISMATCH'}")
            assert ok, (k, v, g)

        # reference-written file back into Python
        back = read_ref_tsdf(p_out, voxel_size=0.02, truncation=0.1)
        assert back.num_active == len(coords)
        for coord, slot in vol.slot_of.items():
            b = back.slot_of[coord]
            m = written[slot]
            np.testing.assert_allclose(np.asarray(back.sdf[b])[m], sdf[slot][m], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(back.weight[b])[m], wgt[slot][m], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(back.color[b])[m], col[slot][m], rtol=1e-6)
    print("python -> reference C++ -> python round trip: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
