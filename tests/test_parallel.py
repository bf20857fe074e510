"""Multi-chip sharding paths on the 8-device virtual CPU mesh.

Covers SURVEY §2.10's scaling axes as pytest (previously only the driver
dry run exercised them): pixel-sharded dense tracking with psum'd normal
equations, point-sharded BA Schur psum, block-sharded TSDF integration,
and the sharded fused (device-hash + Pallas) TSDF step.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from onepiece_tpu.geometry.camera import TUM_CAMERA


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    return Mesh(np.array(devs[:8]), ("d",))


@pytest.fixture(scope="module")
def cam():
    return TUM_CAMERA.pyramid(3)[-1]  # 160x120


def test_dense_tracking_sharded_matches_local(mesh, cam):
    import jax.numpy as jnp

    from onepiece_tpu.geometry import se3
    from onepiece_tpu.odometry import dense
    from onepiece_tpu.parallel import dense as pdense
    from onepiece_tpu.utils import synthetic

    scene = synthetic.default_scene()
    T1 = se3.se3_exp(jnp.asarray([0.01, -0.01, 0.015, 0.01, -0.015, 0.008]))
    d0, g0 = synthetic.render(scene, jnp.eye(4), cam.fx, cam.fy, cam.cx,
                              cam.cy, cam.height, cam.width, num_steps=32)
    d1, g1 = synthetic.render(scene, T1, cam.fx, cam.fy, cam.cx, cam.cy,
                              cam.height, cam.width, num_steps=32)
    src = dense.preprocess_frame(g0, d0, cam)
    tgt = dense.preprocess_frame(g1, d1, cam)
    res_sh = pdense.dense_tracking_sharded(src, tgt, cam, mesh)
    assert np.isfinite(np.asarray(res_sh.T_ts)).all()
    # sharding must not change the math: compare against the local
    # reference-exact tracker (same formulation, same iteration counts)
    res_local = dense.dense_tracking_exact(src, tgt, cam)
    err = np.asarray(se3.se3_log(res_sh.T_ts @ np.asarray(se3.inverse_T(res_local.T_ts))))
    assert np.linalg.norm(err) < 1e-3, err


def test_ba_sharded_dryrun(mesh):
    from onepiece_tpu.parallel import ba

    ba.dryrun(mesh)  # self-checking (asserts convergence + cross-device agreement)


def test_tsdf_sharded_dryrun(mesh, cam):
    from onepiece_tpu.parallel import tsdf

    tsdf.dryrun(mesh, cam)  # self-checking vs local integration


def test_fused_sharded_matches_single_device(mesh, cam):
    from onepiece_tpu.parallel import fused

    fused.dryrun(mesh, cam)  # raises on any mismatch vs single-device pool


@pytest.mark.slow
def test_mc_sharded_and_migration_match_single_device(mesh, cam):
    from onepiece_tpu.parallel import mc

    # self-checking: sharded halo-exchange meshing == single-device mesh,
    # and the mesh survives all_to_all block migration unchanged
    mc.dryrun(mesh, cam)


@pytest.mark.slow
def test_submap_parallel_matches_serial(mesh, cam):
    """One submap per device (SURVEY axis 4): the sharded pipeline
    (ppermute consecutive ICP, all_gather loop registration, replicated
    pose-graph solve) must reproduce the serial run of the same stages."""
    import jax.numpy as jnp

    from onepiece_tpu.parallel import submap
    from onepiece_tpu.utils import synthetic

    small = TUM_CAMERA.pyramid(3)[-1]  # 160x120
    s, f = 8, 4
    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(s * f)
    grays = []
    depths = []
    for i in range(s * f):
        d, g = synthetic.render(
            scene, jnp.asarray(poses[i]), small.fx, small.fy, small.cx,
            small.cy, small.height, small.width, num_steps=48,
        )
        grays.append(np.asarray(g))
        depths.append(np.asarray(d))
    grays = np.stack(grays).reshape(s, f, small.height, small.width)
    depths = np.stack(depths).reshape(s, f, small.height, small.width)

    kw = dict(voxel_size=0.05, cloud_capacity=512)
    fp_ser, base_ser, edges_ser = submap.submap_pipeline_serial(
        grays, depths, small, **kw
    )
    fp_sh, base_sh, edges_sh = submap.submap_pipeline_sharded(
        grays, depths, small, mesh, **kw
    )
    assert np.array_equal(np.asarray(edges_sh.valid), np.asarray(edges_ser.valid))
    # the sharded body compiles with different XLA fusion than the serial
    # jits, so 28-iteration GN reductions reassociate (and the bf16
    # quad-row casts land at different fusion points); chained over 8
    # submaps that bounds the pose difference at a couple of cm, not
    # bit-equality
    np.testing.assert_allclose(base_sh, base_ser, atol=3e-2)
    np.testing.assert_allclose(fp_sh, fp_ser, atol=3e-2)
    # the consecutive-ICP edges must actually have fired
    assert np.asarray(edges_sh.valid)[1:, 0].sum() >= s - 2
