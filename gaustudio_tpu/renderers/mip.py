"""MipRenderer — Mip-Splatting rendering with the 3D smoothing filter.

Port of gaustudio/renderers/mip_renderer.py:7-49 (default kernel_size 0.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from gaustudio_tpu import renderers
from gaustudio_tpu.ops.sh import eval_sh
from gaustudio_tpu.renderers.vanilla import VanillaRenderer


@renderers.register("mip_renderer")
class MipRenderer(VanillaRenderer):
    default_conf = {
        "kernel_size": 0.3,
        "scaling_modifier": 1.0,
        "white_background": False,
        "convert_SHs_python": False,
        "compute_cov3D_python": False,
        "debug": False,
    }

    def get_gaussians_properties(self, viewpoint_camera, gaussian_model):
        """mip_renderer.py:28-49: filtered opacity + scaling."""
        if getattr(gaussian_model, "filter_3D", None) is None:
            gaussian_model.compute_3D_filter([viewpoint_camera])
        xyz = gaussian_model.get_attribute("xyz")
        opacity = gaussian_model.get_opacity_with_3D_filter
        scales = None
        rotations = None
        cov3D_precomp = None
        if self.compute_cov3D_python:
            cov3D_precomp = gaussian_model.get_covariance(self.scaling_modifier)
        else:
            scales = gaussian_model.get_scaling_with_3D_filter
            rotations = gaussian_model.get_attribute("rot")
        shs = None
        colors_precomp = None
        if self.convert_SHs_python:
            feats = gaussian_model.get_features
            shs_view = jnp.swapaxes(feats, 1, 2)
            dir_pp = xyz - jnp.asarray(viewpoint_camera.camera_center)[None, :]
            dir_pp = dir_pp / jnp.maximum(
                jnp.linalg.norm(dir_pp, axis=1, keepdims=True), 1e-12
            )
            sh2rgb = eval_sh(gaussian_model.active_sh_degree, shs_view, dir_pp)
            colors_precomp = jnp.maximum(sh2rgb + 0.5, 0.0)
        else:
            shs = gaussian_model.get_features
        return xyz, shs, colors_precomp, opacity, scales, rotations, cov3D_precomp
