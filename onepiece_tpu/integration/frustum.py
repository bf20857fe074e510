"""Camera view frustum: plane extraction and containment tests.

Rebuild of `integration::Frustum` (ref: src/Integration/Frustum.{h,cpp} —
`ComputeFromCamera` :7-25, `ComputeFromVectors` :26-60, `ContainPoint`
Frustum.h:74-103). Containment is a batched half-space test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import PinholeCamera


def frustum_planes(
    camera: PinholeCamera,
    T_wc: jax.Array,  # camera-to-world
    near: float = 0.1,
    far: float = 8.0,
) -> jax.Array:
    """(6, 4) inward-facing planes [n | d] in world coords (n.x + d >= 0
    inside)."""
    # corner rays in camera frame
    corners = jnp.asarray(
        [
            [(0 - camera.cx) / camera.fx, (0 - camera.cy) / camera.fy, 1.0],
            [(camera.width - 1 - camera.cx) / camera.fx, (0 - camera.cy) / camera.fy, 1.0],
            [(camera.width - 1 - camera.cx) / camera.fx, (camera.height - 1 - camera.cy) / camera.fy, 1.0],
            [(0 - camera.cx) / camera.fx, (camera.height - 1 - camera.cy) / camera.fy, 1.0],
        ],
        jnp.float32,
    )
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    rays = corners @ R.T  # world-frame corner directions
    fwd = R[:, 2]

    planes = []
    # side planes: normal = cross of adjacent corner rays, pointing inward
    for i in range(4):
        n = jnp.cross(rays[i], rays[(i + 1) % 4])
        n = n / jnp.clip(jnp.linalg.norm(n), 1e-9, None)
        # ensure inward: the center ray must be on the positive side
        n = jnp.where(jnp.dot(n, fwd) < 0, -n, n)
        planes.append(jnp.concatenate([n, -jnp.dot(n, t)[None]]))
    # near / far
    planes.append(jnp.concatenate([fwd, -jnp.dot(fwd, t + near * fwd)[None]]))
    planes.append(jnp.concatenate([-fwd, jnp.dot(fwd, t + far * fwd)[None]]))
    return jnp.stack(planes)


def contains(planes: jax.Array, points: jax.Array, margin: float = 0.0) -> jax.Array:
    """(6, 4) x (..., 3) -> (...,) bool inside-frustum mask."""
    d = jnp.einsum("pi,...i->...p", planes[:, :3], points) + planes[:, 3]
    return jnp.all(d >= -margin, axis=-1)
