"""Room segmentation over a wall-line arrangement.

Rebuild of the reference's RoomDetection pipeline (ref:
example/RoomDetection.cpp:12-80+ `Building::ComputeWeightsForEachEdge` /
`ComputeEmbedding`): wall evidence weights arrangement edges, a diffusion
over the face-adjacency graph builds an embedding (matrix powers — device
math), and k-means over the embedding labels faces into rooms.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import dcel
from .clustering import kmeans


def edge_wall_evidence(
    arr: dcel.Arrangement,
    wall_points: np.ndarray,  # (N, 2) projected wall points
    max_dist: float = 0.1,
) -> np.ndarray:
    """Fraction of each edge covered by nearby wall points (ref
    ComputeWeightsForEachEdge — evidence that an arrangement edge is a real
    wall)."""
    out = np.zeros(len(arr.edges))
    if len(wall_points) == 0:
        return out
    for ei, (u, v) in enumerate(arr.edges):
        a, b = arr.vertices[u], arr.vertices[v]
        d = b - a
        L = np.linalg.norm(d)
        if L < 1e-9:
            continue
        t = np.clip((wall_points - a) @ d / (L * L), 0.0, 1.0)
        proj = a + t[:, None] * d
        dist = np.linalg.norm(wall_points - proj, axis=-1)
        near = t[dist < max_dist]
        if len(near) == 0:
            continue
        # covered fraction via histogram of projections
        bins = max(int(L / max_dist), 1)
        hist = np.histogram(near, bins=bins, range=(0, 1))[0]
        out[ei] = (hist > 0).mean()
    return out


def diffusion_embedding(
    affinity: np.ndarray, dim: int = 8, steps: int = 8
) -> np.ndarray:
    """Diffusion-map embedding of a face-affinity matrix (device eigh)."""
    a = jnp.asarray(affinity, jnp.float32)
    d = jnp.clip(jnp.sum(a, axis=-1), 1e-9, None)
    p = a / d[:, None]
    # diffuse: P^steps (matrix powers on device)
    pk = jnp.linalg.matrix_power(p, steps)
    evals, evecs = jnp.linalg.eigh((pk + pk.T) * 0.5)
    emb = np.asarray(evecs[:, -dim - 1 : -1] * evals[-dim - 1 : -1])
    return emb


def detect_rooms(
    arr: dcel.Arrangement,
    wall_points: np.ndarray,
    num_rooms: int,
    wall_dist: float = 0.1,
) -> np.ndarray:
    """Label each arrangement face with a room id (ref RoomDetection.cpp)."""
    nf = len(arr.faces)
    if nf == 0:
        return np.zeros(0, np.int64)
    evidence = edge_wall_evidence(arr, wall_points, wall_dist)
    aff = np.zeros((nf, nf))
    for fa, fb, e in dcel.face_adjacency(arr):
        w = np.exp(-4.0 * evidence[e])  # strong wall -> weak affinity
        aff[fa, fb] = aff[fb, fa] = w
    np.fill_diagonal(aff, 1.0)
    emb = diffusion_embedding(aff, dim=min(8, nf - 1) if nf > 1 else 1)
    k = min(num_rooms, nf)
    _, labels = kmeans(
        jax.random.PRNGKey(0), jnp.asarray(emb, jnp.float32),
        jnp.ones(nf, bool), k=k, iters=50,
    )
    return np.asarray(labels)
