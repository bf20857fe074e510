"""Nearest-neighbor search as batched matmuls.

TPU-native replacement for the reference's nanoflann KD-tree
(ref: src/Geometry/KDTree.h:62-365). A KD-tree is pointer-chasing — the worst
possible shape for a systolic array. At the reference's problem sizes
(640x480 frames, submap clouds of 1e4-1e5 points, feature dim 3 or 33) an
exhaustive tiled distance computation rides the MXU at full tilt and is both
exact and faster. Distances use the  |a-b|^2 = |a|^2 + |b|^2 - 2 a.b  trick so
the inner loop is one matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_LARGE = -1e30
LARGE = 1e30


def pairwise_sqdist(
    query: jax.Array, ref: jax.Array, precision=jax.lax.Precision.HIGH
) -> jax.Array:
    """Squared L2 distances (N, D) x (M, D) -> (N, M) via one MXU matmul.

    The package pins the global matmul default to HIGHEST (6-pass bf16) to
    protect geometry math, but NN SELECTION only needs distances ranked
    correctly: HIGH (3-pass bf16, ~19-bit mantissa, 2x the throughput)
    leaves micrometer-scale distance error at scene scale — far below the
    point spacing that decides a neighbor. Pass HIGHEST explicitly where
    exact distances matter.
    """
    qq = jnp.sum(query * query, axis=-1, keepdims=True)
    rr = jnp.sum(ref * ref, axis=-1)
    cross = jnp.dot(
        query, ref.T, preferred_element_type=jnp.float32, precision=precision
    )
    return jnp.maximum(qq + rr[None, :] - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn(
    query: jax.Array,
    ref: jax.Array,
    ref_valid: jax.Array,
    k: int = 1,
    tile: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN: returns (indices (N, k), sqdists (N, k)).

    Invalid reference points (mask False) never match. Query rows are tiled
    with lax.map so the (tile, M) distance block stays VMEM-friendly while M
    can be large.
    """
    n = query.shape[0]
    pad = (-n) % tile
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    rbig = jnp.where(ref_valid[:, None], ref, LARGE)

    def one_tile(qt):
        d = pairwise_sqdist(qt, rbig)
        d = jnp.where(ref_valid[None, :], d, LARGE)
        if k == 1:
            idx = jnp.argmin(d, axis=-1)
            return idx[:, None], jnp.take_along_axis(d, idx[:, None], axis=-1)
        neg_d, idx = jax.lax.top_k(-d, k)
        return idx, -neg_d

    qtiles = qp.reshape(-1, tile, query.shape[-1])
    idx, dist = jax.lax.map(one_tile, qtiles)
    idx = idx.reshape(-1, k)[:n]
    dist = dist.reshape(-1, k)[:n]
    return idx, dist


@functools.partial(jax.jit, static_argnames=("k", "radius", "tile"))
def radius_knn(
    query: jax.Array,
    ref: jax.Array,
    ref_valid: jax.Array,
    k: int,
    radius: float,
    tile: int = 2048,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """k nearest neighbors within `radius` (ref: KDTree.h `KnnRadiusSearch`).

    Returns (indices (N, k), sqdists (N, k), in_radius_mask (N, k)).
    """
    idx, dist = knn(query, ref, ref_valid, k=k, tile=tile)
    mask = dist <= radius * radius
    return idx, dist, mask
