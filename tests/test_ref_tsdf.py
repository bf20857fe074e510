"""Reference-binary TSDF format interop (io/ref_tsdf.py): round-trip
fidelity of the reference's sparse cube file format (ref:
CubeHandler.h:40-128, VoxelCube.h:128-167), including the x-fastest vs
z-fastest voxel-index permutation."""

import numpy as np

import jax.numpy as jnp

from onepiece_tpu.integration.blocks import TSDFVolume
from onepiece_tpu.io.ref_tsdf import read_ref_tsdf, write_ref_tsdf


def _random_volume(seed=0, blocks=5):
    rng = np.random.default_rng(seed)
    vol = TSDFVolume(voxel_size=0.02, truncation=0.1, capacity=8)
    n = 8
    sdf = np.full((8, n, n, n), 999.0, np.float32)
    wgt = np.zeros((8, n, n, n), np.float32)
    col = np.zeros((8, n, n, n, 3), np.float32)
    coords = rng.integers(-20, 20, (blocks, 3)).astype(np.int64)
    coords = np.unique(coords, axis=0)
    for b in range(len(coords)):
        mask = rng.random((n, n, n)) < 0.3
        sdf[b][mask] = rng.uniform(-0.999, 0.999, mask.sum()).astype(np.float32)
        wgt[b][mask] = rng.uniform(1.0, 50.0, mask.sum()).astype(np.float32)
        col[b][mask] = rng.uniform(0.0, 1.0, (mask.sum(), 3)).astype(np.float32)
    vol.sdf = jnp.asarray(sdf)
    vol.weight = jnp.asarray(wgt)
    vol.color = jnp.asarray(col)
    vol.block_coords[: len(coords)] = coords
    vol.slot_of = {tuple(c): i for i, c in enumerate(coords.tolist())}
    vol.num_active = len(coords)
    return vol


def test_ref_tsdf_roundtrip(tmp_path):
    vol = _random_volume()
    path = str(tmp_path / "vol.cube")
    write_ref_tsdf(path, vol)
    back = read_ref_tsdf(path, voxel_size=0.02, truncation=0.1)
    assert back.num_active == vol.num_active
    # blocks may come back in any order: match by coords
    for coord, slot in vol.slot_of.items():
        b = back.slot_of[coord]
        s0 = np.asarray(vol.sdf[slot])
        w0 = np.asarray(vol.weight[slot])
        c0 = np.asarray(vol.color[slot])
        written = (np.abs(s0) < 1.0) & (w0 != 0)
        np.testing.assert_allclose(np.asarray(back.sdf[b])[written], s0[written], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.weight[b])[written], w0[written], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.color[b])[written], c0[written], rtol=1e-6)
        # unwritten voxels stay empty
        assert (np.asarray(back.weight[b])[~written] == 0).all()


def test_ref_tsdf_header_is_uint_bitpattern(tmp_path):
    """The count header is a uint32 BIT-PATTERN in a float slot, exactly as
    the reference reinterprets it (CubeHandler.h:52)."""
    vol = _random_volume(blocks=3)
    path = str(tmp_path / "vol.cube")
    write_ref_tsdf(path, vol)
    raw = np.fromfile(path, dtype="<u4")
    assert int(raw[0]) == vol.num_active
