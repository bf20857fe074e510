"""Mesh simplification (native QEM + clustering) and pruning tests."""

import numpy as np
import pytest

from onepiece_tpu.geometry.mesh import TriangleMesh


def icosphere(subdiv=3, radius=1.0):
    """Build an icosphere by subdividing an icosahedron."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    for _ in range(subdiv):
        edge_mid: dict = {}
        new_faces = []
        vlist = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (vlist[a] + vlist[b]) / 2
                m /= np.linalg.norm(m)
                edge_mid[key] = len(vlist)
                vlist.append(m)
            return edge_mid[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, np.int64)
    return (verts * radius).astype(np.float32), faces


def test_qem_simplify_sphere():
    v, f = icosphere(3)  # 1280 faces
    mesh = TriangleMesh(v, f)
    simp = mesh.quadric_simplify(target_faces=300)
    assert simp.faces.shape[0] <= 320
    assert simp.faces.shape[0] >= 250
    # vertices still on the unit sphere
    r = np.linalg.norm(simp.vertices, axis=-1)
    assert np.abs(r - 1.0).max() < 0.05
    # still watertight
    edges = np.concatenate([simp.faces[:, [0, 1]], simp.faces[:, [1, 2]], simp.faces[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_clustering_simplify():
    v, f = icosphere(3)
    mesh = TriangleMesh(v, f)
    simp = mesh.clustering_simplify(cell_size=0.3)
    assert simp.faces.shape[0] < f.shape[0] * 0.5
    r = np.linalg.norm(simp.vertices, axis=-1)
    assert np.abs(r - 1.0).max() < 0.1


def test_prune_small_components():
    v1, f1 = icosphere(2)  # 320 faces
    v2, f2 = icosphere(0, radius=0.1)  # 20 faces, offset
    v2 = v2 + 5.0
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    mesh = TriangleMesh(verts.astype(np.float32), faces)
    pruned = mesh.prune(min_faces=100)
    assert pruned.faces.shape[0] == f1.shape[0]
    assert np.abs(np.linalg.norm(pruned.vertices, axis=-1) - 1.0).max() < 1e-5


def test_vertex_normals_sphere():
    v, f = icosphere(2)
    mesh = TriangleMesh(v, f).compute_vertex_normals()
    # normals of a sphere point radially
    dots = np.sum(mesh.normals * v / np.linalg.norm(v, axis=-1, keepdims=True), axis=-1)
    assert dots.min() > 0.99
