"""Visual-hull initializer (initializers/mask.py:16-108): carve a voxel grid
by per-view masks, extract the hull surface, place Gaussians on it."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.pipelines import initializers
from gaustudio_tpu.pipelines.initializers.base import BaseInitializer
from gaustudio_tpu.pipelines.initializers.mesh import MeshInitializer


@initializers.register("VisualHull")
class VisualHullInitializer(BaseInitializer):
    def __init__(self, initializer_config):
        super().__init__(initializer_config)
        self.resolution = int(self.initializer_config.get("resolution", 128))
        self.radius_scale = float(self.initializer_config.get("radius_scale", 1.0))

    def __call__(self, model, dataset=None, overwrite=False):
        self.cache_dataset(dataset)
        return self.build_model(model)

    def cache_dataset(self, dataset):
        from gaustudio_tpu.datasets.utils import getNerfppNorm
        from gaustudio_tpu.ops import mcubes

        norm = getNerfppNorm(list(dataset))
        center = -norm["translate"]
        radius = norm["min_radius"] * self.radius_scale

        res = self.resolution
        lin = np.linspace(-radius, radius, res, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3) + center

        occupancy = np.ones(len(pts), np.float32)
        for camera in dataset:
            mask = camera.mask
            if mask is None:
                mask = np.ones((camera.image_height, camera.image_width), np.float32)
            inside = np.asarray(camera.insideView(jnp.asarray(pts), jnp.asarray(mask)))
            # carve everything not inside the mask (out-of-frustum included),
            # matching the reference's insideView-based carving (mask.py:16-108)
            occupancy = np.where(~inside, 0.0, occupancy)

        field = 0.5 - occupancy.reshape(res, res, res)  # negative inside
        verts, faces = mcubes.marching_tetrahedra(
            field, 0.0, origin=center - radius, voxel_size=2 * radius / (res - 1),
            slab=4,
        )
        self.mesh = (verts, faces)

    def build_model(self, model):
        if len(self.mesh[0]) == 0:
            raise ValueError("visual hull carving produced an empty surface")
        sub = MeshInitializer(self.initializer_config)
        return sub(model, mesh=self.mesh)
