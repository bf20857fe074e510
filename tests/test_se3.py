"""SE3/SO3 unit tests: round-trips, group axioms, agreement with scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from onepiece_tpu.geometry import se3

RNG = np.random.default_rng(0)


def random_twists(n, scale=1.0):
    return jnp.asarray(RNG.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_so3_exp_matches_scipy():
    phi = RNG.normal(size=(64, 3)) * 2.0
    R_ours = np.asarray(se3.so3_exp(jnp.asarray(phi, jnp.float32)))
    R_scipy = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=2e-5)


def test_so3_log_roundtrip():
    phi = RNG.normal(size=(64, 3))
    phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True) * RNG.uniform(0, 3.0, size=(64, 1))
    R = se3.so3_exp(jnp.asarray(phi, jnp.float32))
    phi2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-3)


def test_so3_log_small_angle():
    phi = jnp.asarray(RNG.normal(size=(16, 3)) * 1e-5, jnp.float32)
    R = se3.so3_exp(phi)
    np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.asarray(phi), atol=1e-6)


def test_so3_log_near_pi():
    axis = RNG.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    phi = axis * (np.pi - 1e-4)
    R = se3.so3_exp(jnp.asarray(phi, jnp.float32))
    phi2 = np.asarray(se3.so3_log(R))
    # axis-angle near pi is sign-ambiguous; compare rotations instead
    R2 = np.asarray(se3.so3_exp(jnp.asarray(phi2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip():
    xi = random_twists(128, 0.8)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)


def test_se3_exp_identity():
    T = se3.se3_exp(jnp.zeros((6,), jnp.float32))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_se3_group_closure_and_inverse():
    xi = random_twists(32, 0.5)
    T = se3.se3_exp(xi)
    Tinv = se3.inverse_T(T)
    eye = jnp.einsum("nij,njk->nik", T, Tinv)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), (32, 4, 4)), atol=1e-5)
    # bottom row structure
    np.testing.assert_allclose(np.asarray(T[:, 3, :]), np.broadcast_to([0, 0, 0, 1.0], (32, 4)), atol=0)


def test_transform_points_matches_manual():
    xi = random_twists(4, 0.5)
    T = se3.se3_exp(xi)
    pts = jnp.asarray(RNG.normal(size=(4, 100, 3)), jnp.float32)
    out = se3.transform_points(T, pts)
    for i in range(4):
        manual = np.asarray(pts[i]) @ np.asarray(T[i, :3, :3]).T + np.asarray(T[i, :3, 3])
        np.testing.assert_allclose(np.asarray(out[i]), manual, atol=1e-5)


def test_jit_and_vmap():
    xi = random_twists(8, 0.5)
    T1 = jax.jit(se3.se3_exp)(xi)
    T2 = jax.vmap(se3.se3_exp)(xi)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-6)


def test_skew():
    v = jnp.asarray([1.0, 2.0, 3.0])
    K = np.asarray(se3.skew(v))
    a = RNG.normal(size=3).astype(np.float32)
    np.testing.assert_allclose(K @ a, np.cross([1, 2, 3], a), atol=1e-5)
