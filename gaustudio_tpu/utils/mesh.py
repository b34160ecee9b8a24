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


def sample_mesh_surface(vertices, faces, n_samples: int, seed: int = 0
                        ) -> np.ndarray:
    """Area-weighted uniform surface samples [n_samples, 3] (numpy)."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("degenerate mesh: zero total surface area")
    rng = np.random.default_rng(seed)
    fid = rng.choice(len(f), size=n_samples, p=areas / total)
    r1 = np.sqrt(rng.uniform(size=(n_samples, 1)))
    r2 = rng.uniform(size=(n_samples, 1))
    pts = (a[fid] * (1 - r1) + b[fid] * (r1 * (1 - r2))
           + c[fid] * (r1 * r2))
    return pts.astype(np.float32)


def mesh_f1_score(verts_a, faces_a, verts_b, faces_b, tau: float,
                  n_samples: int = 20000, seed: int = 0) -> dict:
    """Symmetric mesh F1 at threshold ``tau`` (the TnT / gaustudio metric:
    precision = fraction of A-samples within tau of B, recall = fraction of
    B-samples within tau of A, F1 = harmonic mean)."""
    from scipy.spatial import cKDTree

    sa = sample_mesh_surface(verts_a, faces_a, n_samples, seed)
    sb = sample_mesh_surface(verts_b, faces_b, n_samples, seed + 1)
    d_ab = cKDTree(sb).query(sa, k=1)[0]
    d_ba = cKDTree(sa).query(sb, k=1)[0]
    precision = float((d_ab < tau).mean())
    recall = float((d_ba < tau).mean())
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "chamfer": float(d_ab.mean() + d_ba.mean()) / 2}


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
