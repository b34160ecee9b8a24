"""VanillaRenderer — standard 3DGS rendering.

Port of gaustudio/renderers/vanilla_renderer.py:7-52: activated attribute
pull, optional python-side SH evaluation and cov3D precompute, 2D-scale
padding for surfel checkpoints.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaustudio_tpu import renderers
from gaustudio_tpu.renderers.base import BaseRenderer
from gaustudio_tpu.ops.sh import eval_sh


@renderers.register("vanilla_renderer")
class VanillaRenderer(BaseRenderer):
    default_conf = {
        "kernel_size": 0.0,
        "scaling_modifier": 1.0,
        "white_background": False,
        "convert_SHs_python": False,
        "compute_cov3D_python": False,
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
        self.convert_SHs_python = self.config["convert_SHs_python"]
        self.compute_cov3D_python = self.config["compute_cov3D_python"]
        self.debug = self.config["debug"]

    def get_gaussians_properties(self, viewpoint_camera, gaussian_model):
        """vanilla_renderer.py:28-51."""
        xyz = gaussian_model.get_attribute("xyz")
        opacity = gaussian_model.get_attribute("opacity")
        scales = None
        rotations = None
        cov3D_precomp = None
        if self.compute_cov3D_python:
            cov3D_precomp = gaussian_model.get_covariance(self.scaling_modifier)
        else:
            scales = gaussian_model.get_attribute("scale")
            if scales.shape[-1] == 2:
                # 2DGS checkpoints: pad flat z-scale (vanilla_renderer.py:38-39)
                scales = jnp.concatenate(
                    [scales, jnp.zeros_like(scales[:, :1]) + 1e-7], axis=-1
                )
            rotations = gaussian_model.get_attribute("rot")

        shs = None
        colors_precomp = None
        if self.convert_SHs_python:
            feats = gaussian_model.get_features  # [N, K, 3]
            shs_view = jnp.swapaxes(feats, 1, 2)  # [N, 3, K]
            dir_pp = xyz - jnp.asarray(viewpoint_camera.camera_center)[None, :]
            dir_pp = dir_pp / jnp.maximum(
                jnp.linalg.norm(dir_pp, axis=1, keepdims=True), 1e-12
            )
            sh2rgb = eval_sh(gaussian_model.active_sh_degree, shs_view, dir_pp)
            colors_precomp = jnp.maximum(sh2rgb + 0.5, 0.0)
        else:
            shs = gaussian_model.get_features
        return xyz, shs, colors_precomp, opacity, scales, rotations, cov3D_precomp
