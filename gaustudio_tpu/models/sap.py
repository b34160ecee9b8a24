"""ShapeAsPoints — differentiable Poisson surface reconstruction as a model.

Port of gaustudio/models/sap.py:10-198: stores inverse-sigmoid point
positions + normals; ``generate_mesh`` runs DPSR -> tanh -> marching on the
indicator grid; constructors from point clouds and meshes.  Used as the
default ``--meshing sap`` backend of gs-extract-pcd (extract_pcd.py:102-106).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu import models
from gaustudio_tpu.models.base import BasePointCloud
from gaustudio_tpu.models.utils import inverse_sigmoid
from gaustudio_tpu.ops import dpsr as dpsr_ops


@models.register("sap_pcd")
class ShapeAsPoints(BasePointCloud):
    default_conf = {
        "attributes": {"xyz": 3, "normal": 3},
        "grid_res": 128,
        "psr_sigma": 2.0,
        "zero_level": 0.0,
    }

    def setup_functions(self):
        self._center = np.zeros(3, np.float32)
        self._scale_factor = 1.0

    # -- constructors (sap.py:44-154) ----------------------------------------
    @classmethod
    def from_pointcloud(cls, xyz, normals, config=None):
        """Normalize points into (0,1)^3 with margin, store inverse-sigmoid
        coords (sap.py convention: positions live in sigmoid space)."""
        obj = cls(config)
        xyz = np.asarray(xyz, np.float32)
        normals = np.asarray(normals, np.float32)
        center = (xyz.min(0) + xyz.max(0)) / 2
        scale = float(np.max(xyz.max(0) - xyz.min(0))) * 1.2 + 1e-6
        unit = (xyz - center) / scale + 0.5  # in ~(0.08, 0.92)
        unit = np.clip(unit, 1e-4, 1 - 1e-4)
        obj._xyz = np.asarray(inverse_sigmoid(jnp.asarray(unit)))
        obj._normal = normals
        obj.num_points = len(xyz)
        obj._center = center
        obj._scale_factor = scale
        return obj

    @classmethod
    def from_mesh(cls, vertices, faces, n_samples: int = 100000, config=None,
                  seed: int = 0):
        """Sample oriented points from a mesh surface (sap.py:44-86)."""
        rng = np.random.default_rng(seed)
        v = np.asarray(vertices, np.float32)
        f = np.asarray(faces, np.int64)
        v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        fn = np.cross(v1 - v0, v2 - v0)
        areas = 0.5 * np.linalg.norm(fn, axis=1)
        probs = areas / areas.sum()
        tri = rng.choice(len(f), size=n_samples, p=probs)
        r1 = np.sqrt(rng.uniform(size=(n_samples, 1)))
        r2 = rng.uniform(size=(n_samples, 1))
        pts = (
            (1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri] + r1 * r2 * v2[tri]
        ).astype(np.float32)
        nrm = fn[tri] / np.maximum(np.linalg.norm(fn[tri], axis=1, keepdims=True), 1e-12)
        return cls.from_pointcloud(pts, nrm.astype(np.float32), config)

    # -- surface generation (sap.py:170-181) ---------------------------------
    @property
    def unit_points(self):
        return 1.0 / (1.0 + np.exp(-np.asarray(self._xyz)))

    def psr_grid(self):
        res = int(self.config["grid_res"])
        phi = dpsr_ops.dpsr_solve(
            jnp.asarray(self.unit_points), jnp.asarray(self._normal),
            (res, res, res), sig=float(self.config["psr_sigma"]),
        )
        return jnp.tanh(phi)

    def generate_mesh(self) -> Tuple[np.ndarray, np.ndarray]:
        """DPSR grid -> tanh -> marching; verts mapped back to world."""
        grid = self.psr_grid()
        verts_unit, faces, _ = dpsr_ops.mc_from_psr(
            grid, zero_level=float(self.config["zero_level"])
        )
        verts = (verts_unit - 0.5) * self._scale_factor + self._center
        return verts.astype(np.float32), faces

    def export(self, path):
        from gaustudio_tpu.utils.mesh import save_mesh

        verts, faces = self.generate_mesh()
        save_mesh(path, verts, faces)
