"""PCDRenderer — renders plain RGB point clouds as tiny fixed-size Gaussians.

Port of gaustudio/renderers/pcd_renderer.py:5-34.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaustudio_tpu import renderers
from gaustudio_tpu.renderers.base import BaseRenderer


@renderers.register("pcd_renderer")
class PCDRenderer(BaseRenderer):
    default_conf = {
        "kernel_size": 0.01,
        "scaling_modifier": 1.0,
        "white_background": False,
        "debug": False,
    }

    def __init__(self, config=None) -> None:
        super().__init__(config)
        self.kernel_size = self.config["kernel_size"]
        self.scaling_modifier = self.config["scaling_modifier"]
        self.white_background = self.config["white_background"]
        self.bg_color = (
            jnp.ones(3, jnp.float32) if self.white_background else jnp.zeros(3, jnp.float32)
        )
        self.debug = self.config["debug"]

    def get_gaussians_properties(self, viewpoint_camera, gaussian_model):
        """pcd_renderer.py:23-33: fixed scale, identity rot, opacity 1,
        colors from the rgb attribute."""
        xyz = gaussian_model.get_attribute("xyz")
        n = xyz.shape[0]
        rgb = jnp.asarray(gaussian_model.get_attribute("rgb"))
        if rgb.max() > 1.0 + 1e-6:
            rgb = rgb / 255.0
        opacity = jnp.ones((n, 1), jnp.float32)
        scales = jnp.full((n, 3), self.kernel_size, jnp.float32)
        rotations = jnp.concatenate(
            [jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 3), jnp.float32)], axis=-1
        )
        return xyz, None, rgb, opacity, scales, rotations, None
