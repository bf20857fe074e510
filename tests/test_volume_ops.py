"""TSDF save/load, merge, and rigid-transform resampling tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from onepiece_tpu.geometry import se3
from onepiece_tpu.integration.blocks import TSDFVolume
from onepiece_tpu.integration import volume_ops
from onepiece_tpu.ops.tsdf import voxel_centers_world


def analytic_volume(center, radius=0.3, voxel=0.05, extent=2):
    """Volume filled with a sphere's analytic (normalised) SDF."""
    vol = TSDFVolume(voxel_size=voxel, truncation=voxel * 6, capacity=256)
    coords = np.array(
        [[x, y, z] for x in range(-extent, extent) for y in range(-extent, extent) for z in range(-extent, extent)]
    )
    vol.allocate(coords)
    n = vol.num_active
    centers = voxel_centers_world(jnp.asarray(vol.active_coords(), jnp.int32), voxel)
    sdf = (jnp.linalg.norm(centers - jnp.asarray(center), axis=-1) - radius) / vol.truncation
    vol.sdf = vol.sdf.at[:n].set(jnp.clip(sdf, -1, 1).reshape(n, 8, 8, 8))
    vol.weight = vol.weight.at[:n].set(1.0)
    return vol


def test_save_load_roundtrip(tmp_path):
    vol = analytic_volume([0.1, 0.0, 0.05])
    path = str(tmp_path / "vol.npz")
    volume_ops.save_volume(vol, path)
    back = volume_ops.load_volume(path)
    assert back.num_active == vol.num_active
    np.testing.assert_allclose(
        np.asarray(back.sdf[: vol.num_active]), np.asarray(vol.sdf[: vol.num_active]), atol=0
    )
    assert back.voxel_size == vol.voxel_size
    # same mesh out
    tv1, _ = vol.extract_mesh()
    tv2, _ = back.extract_mesh()
    assert len(tv1) == len(tv2)


def test_merge_weighted_average():
    a = analytic_volume([0.0, 0.0, 0.0])
    b = analytic_volume([0.0, 0.0, 0.0])
    # bias b's sdf: merged (equal weights) must be the average
    nb = b.num_active
    b.sdf = b.sdf.at[:nb].add(0.2)
    m = volume_ops.merge_volumes(a, b)
    na = a.num_active
    idx = [m.slot_of[tuple(c)] for c in a.active_coords()]
    merged = np.asarray(m.sdf)[idx]
    expect = np.asarray(a.sdf[:na]) + 0.1
    np.testing.assert_allclose(merged, expect, atol=1e-5)
    # weights add
    assert np.allclose(np.asarray(m.weight)[idx], 2.0)


def test_merge_disjoint_regions():
    a = analytic_volume([0.0, 0.0, 0.0], extent=1)
    b = TSDFVolume(voxel_size=a.voxel_size, truncation=a.truncation, capacity=64)
    b.allocate(np.array([[5, 5, 5]]))
    b.sdf = b.sdf.at[0].set(0.5)
    b.weight = b.weight.at[0].set(3.0)
    m = volume_ops.merge_volumes(a, b)
    assert m.num_active == a.num_active + 1
    s = m.slot_of[(5, 5, 5)]
    assert np.allclose(np.asarray(m.sdf)[s], 0.5)
    assert np.allclose(np.asarray(m.weight)[s], 3.0)


@pytest.mark.parametrize("nearest", [False, True])
def test_transform_moves_surface(nearest):
    center = np.array([0.05, -0.03, 0.04])
    vol = analytic_volume(center, radius=0.25)
    T = np.asarray(se3.se3_exp(jnp.asarray([0.08, 0.05, -0.06, 0.15, -0.1, 0.2], jnp.float32)))
    out = volume_ops.transform_volume(vol, T, nearest=nearest)
    # extract mesh from transformed volume: vertices should lie on the
    # transformed sphere
    tv, _ = out.extract_mesh()
    assert len(tv) > 100
    verts = tv.reshape(-1, 3)
    new_center = T[:3, :3] @ center + T[:3, 3]
    r = np.linalg.norm(verts - new_center, axis=-1)
    tol = 0.02 if nearest else 0.01
    assert abs(np.median(r) - 0.25) < tol, np.median(r)


def test_transform_identity_preserves():
    vol = analytic_volume([0.0, 0.0, 0.0])
    out = volume_ops.transform_volume(vol, np.eye(4))
    # compare sdf at shared blocks
    common = [c for c in map(tuple, vol.active_coords()) if c in out.slot_of]
    assert len(common) == vol.num_active
    for c in common[:10]:
        s_old = np.asarray(vol.sdf)[vol.slot_of[c]]
        s_new = np.asarray(out.sdf)[out.slot_of[c]]
        w_new = np.asarray(out.weight)[out.slot_of[c]]
        m = w_new > 0
        np.testing.assert_allclose(s_new[m], s_old[m], atol=1e-4)
