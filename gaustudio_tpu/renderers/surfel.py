"""SurfelRenderer — 2DGS rendering via the JAX surfel rasterizer.

Port of gaustudio/renderers/surfel_renderer.py:6-127 with the external
``diff_surfel_rasterization`` CUDA dependency replaced by
ops.rasterize_surfel.  Output decode matches surfel_renderer.py:96-117:
expected depth divided by alpha, normals rotated to world, median buffers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gaustudio_tpu import renderers
from gaustudio_tpu.ops import rasterize_surfel
from gaustudio_tpu.ops.rasterize import RasterizeSettings
from gaustudio_tpu.renderers.base import BaseRenderer
from gaustudio_tpu.ops.sh import eval_sh


@renderers.register("surfel_renderer")
class SurfelRenderer(BaseRenderer):
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
        self.scaling_modifier = self.config["scaling_modifier"]
        self.white_background = self.config["white_background"]
        self.bg_color = (
            jnp.ones(3, jnp.float32) if self.white_background else jnp.zeros(3, jnp.float32)
        )
        self.convert_SHs_python = self.config["convert_SHs_python"]
        self.debug = self.config["debug"]

    def get_gaussians_properties(self, viewpoint_camera, gaussian_model):
        xyz = gaussian_model.get_attribute("xyz")
        opacity = gaussian_model.get_attribute("opacity")
        scales = gaussian_model.get_attribute("scale")
        if scales.shape[-1] == 3:
            scales = scales[:, :2]
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
        return xyz, shs, colors_precomp, opacity, scales, rotations, None

    def dp_render_closure(self, cameras, gaussian_model,
                          settings_overrides=None, probe_cams: int = 8):
        """Camera-DP closure over the surfel rasterizer; adapts the raw
        kernel output keys to the fuse contract (rendered_final_opacity /
        rendered_median_depth, parallel/render_dp.make_dp_fuse_fn)."""
        (xyz, shs, colors_precomp, opacity, scales, rotations, _) = (
            self.get_gaussians_properties(cameras[0], gaussian_model)
        )
        # probe capacity with padded 3D scales (flat z)
        scales3 = jnp.concatenate(
            [scales, jnp.zeros_like(scales[:, :1]) + 1e-7], -1)
        settings = self._dp_probe_settings(
            cameras, gaussian_model, settings_overrides, probe_cams,
            xyz, opacity, scales3, rotations, None)
        active_deg = (getattr(gaussian_model, "active_sh_degree", None)
                      if shs is not None else None)
        active_key = None if active_deg is None else int(active_deg)
        m2d = jnp.zeros((xyz.shape[0], 2), jnp.float32)

        def render_fn(s):
            out = rasterize_surfel.rasterize_surfels(
                xyz, opacity, s, scales=scales, rotations=rotations,
                shs=shs, colors_precomp=colors_precomp, means2D_offset=m2d,
                active_sh_degree=active_key,
            )
            out = dict(out)
            out["rendered_final_opacity"] = out["rendered_alpha"]
            return out

        return settings, render_fn

    def render(self, viewpoint_camera, gaussian_model, means2D_offset=None,
               settings_overrides=None):
        (xyz, shs, colors_precomp, opacity, scales, rotations, _) = (
            self.get_gaussians_properties(viewpoint_camera, gaussian_model)
        )
        probe = self.make_settings(viewpoint_camera, gaussian_model, 4096)
        # probe capacity with padded 3D scales (flat z) via the base helper
        scales3 = jnp.concatenate([scales, jnp.zeros_like(scales[:, :1]) + 1e-7], -1)
        cap = self._capacity(
            viewpoint_camera, xyz, opacity, scales3, rotations, None, probe
        )
        settings = probe._replace(num_entries=cap)
        if settings_overrides:
            settings = settings._replace(**settings_overrides)

        if means2D_offset is None:
            means2D_offset = jnp.zeros((xyz.shape[0], 2), jnp.float32)

        active_deg = (getattr(gaussian_model, "active_sh_degree", None)
                      if shs is not None else None)
        active_key = None if active_deg is None else int(active_deg)
        # one fused jit per static-settings key (see BaseRenderer._render_jitted:
        # eager dispatch costs seconds/view on a relay-attached TPU)
        key = ("surfel",
               settings._replace(bg=None, viewmatrix=None, projmatrix=None,
                                 campos=None),
               shs is None, colors_precomp is None, active_key)
        fn = self._jit_cache.get(key)
        if fn is None:
            template = key[1]

            @jax.jit
            def fn(xyz, opacity, scales, rotations, shs, colors_precomp,
                   means2D_offset, view, proj, campos, bg):
                st = template._replace(viewmatrix=view, projmatrix=proj,
                                       campos=campos, bg=bg)
                return rasterize_surfel.rasterize_surfels(
                    xyz, opacity, st, scales=scales, rotations=rotations,
                    shs=shs, colors_precomp=colors_precomp,
                    means2D_offset=means2D_offset,
                    active_sh_degree=active_key,
                )

            self._jit_cache[key] = fn
        out = fn(xyz, opacity, scales, rotations, shs, colors_precomp,
                 means2D_offset, settings.viewmatrix, settings.projmatrix,
                 settings.campos, settings.bg)

        alpha = out["rendered_alpha"]
        depth_expected = jnp.nan_to_num(
            out["rendered_depth_sum"] / jnp.maximum(alpha, 1e-9), 0.0, 0.0
        )
        # rotate view normals to world: n @ R_v2w (surfel_renderer.py:100-101)
        w2v = jnp.asarray(viewpoint_camera.world_view_transform)
        n_view = jnp.moveaxis(out["rendered_normal_view"], 0, -1)
        n_world = jnp.einsum("hwj,ij->hwi", n_view, w2v[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST)
        return {
            "render": out["render"],
            "rendered_normal": jnp.moveaxis(n_world, -1, 0),
            "rendered_depth": depth_expected,
            "rendered_median_depth": out["rendered_median_depth"],
            "rendered_median_weight": out["rendered_median_weight"],
            "rendered_median_id": out["rendered_median_id"],
            "rendered_dist_m1": out["rendered_dist_m1"],
            "rendered_dist_m2": out["rendered_dist_m2"],
            "viewspace_points": means2D_offset,
            "visibility_filter": out["radii"] > 0,
            "rendered_final_opacity": alpha,
            "radii": out["radii"],
            "num_rendered": out["num_rendered"],
        }
