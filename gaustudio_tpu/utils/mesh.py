"""Mesh helpers: PLY IO and connected-component cleanup.

Replaces the reference's trimesh/open3d usage in scripts/extract_mesh.py
(trimesh export :146-147; o3d cluster_connected_triangles cleanup :150-186).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gaustudio_tpu.utils.ply import read_ply, write_ply


def save_mesh(path: str, vertices: np.ndarray, faces: np.ndarray,
              vertex_colors=None) -> None:
    props = {
        "x": vertices[:, 0].astype(np.float32),
        "y": vertices[:, 1].astype(np.float32),
        "z": vertices[:, 2].astype(np.float32),
    }
    if vertex_colors is not None:
        c = np.asarray(vertex_colors)
        if c.dtype != np.uint8:
            c = np.clip(c * 255.0, 0, 255).astype(np.uint8)
        props["red"], props["green"], props["blue"] = c[:, 0], c[:, 1], c[:, 2]
    write_ply(path, props, faces=np.asarray(faces, np.int32))


def load_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    data = read_ply(path)
    v = data["vertex"]
    verts = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    faces = np.asarray(data["face"]["vertex_indices"], np.int32)
    return verts, faces


class _UnionFind:
    def __init__(self, n):
        self.parent = np.arange(n)

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def connected_components(faces: np.ndarray, num_vertices: int) -> np.ndarray:
    """Label each face by its vertex-connected component."""
    uf = _UnionFind(num_vertices)
    for f in np.asarray(faces):
        uf.union(f[0], f[1])
        uf.union(f[0], f[2])
    roots = np.array([uf.find(v) for v in range(num_vertices)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels[np.asarray(faces)[:, 0]]


def clean_mesh_components(vertices, faces, ratio_threshold: float = 0.5):
    """Keep components with > ratio*largest triangles
    (extract_mesh.py:150-186 semantics)."""
    faces = np.asarray(faces)
    if len(faces) == 0:
        return np.asarray(vertices), faces
    labels = connected_components(faces, len(vertices))
    counts = np.bincount(labels)
    largest = counts.max()
    keep_clusters = np.where(counts > ratio_threshold * largest)[0]
    keep = np.isin(labels, keep_clusters)
    faces = faces[keep]
    # remove unreferenced vertices
    used = np.unique(faces)
    remap = -np.ones(len(vertices), np.int64)
    remap[used] = np.arange(len(used))
    return np.asarray(vertices)[used], remap[faces].astype(np.int32)
