"""BaseRenderer — camera + model -> rendered buffer dict.

Port of gaustudio/renderers/base.py:9-63 on top of the functional JAX
rasterizer: builds RasterizeSettings from the camera (tanfov, transposed W2V,
full-proj, campos), tracks a zero ``means2D_offset`` whose gradient carries
the densification statistics (replacing the reference's retain_grad
screenspace_points, base.py:13-17), and returns the same output dict.

Intersection-list capacity is auto-probed per (W, H) and bucketed to powers
of two (the static-shape substitute for the CUDA dynamic buffer resize).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp

from gaustudio_tpu.ops import rasterize as rast
from gaustudio_tpu.ops.rasterize import RasterizeSettings


class BaseRenderer:
    default_conf: Dict = {}
    # True when get_gaussians_properties depends on the camera (scaffold's
    # view-dependent neural decode): such renderers cannot hoist one
    # property set over a camera-DP batch (parallel/render_dp.py)
    view_dependent_gaussians = False

    def __init__(self, config=None):
        self.config = {**self.default_conf, **(config or {})}
        self._capacity_cache: Dict[Tuple[int, int], int] = {}
        self._jit_cache: Dict = {}

    # subclasses provide get_gaussians_properties(camera, model)

    def make_settings(self, camera, gaussian_model, num_entries: int,
                      sh_degree=None) -> RasterizeSettings:
        return RasterizeSettings(
            image_height=int(camera.image_height),
            image_width=int(camera.image_width),
            tanfovx=math.tan(camera.FoVx * 0.5),
            tanfovy=math.tan(camera.FoVy * 0.5),
            bg=jnp.asarray(self.bg_color, jnp.float32),
            scale_modifier=self.scaling_modifier,
            viewmatrix=jnp.asarray(camera.world_view_transform),
            projmatrix=jnp.asarray(camera.full_proj_transform),
            sh_degree=(
                gaussian_model.max_sh_degree
                if sh_degree is None and hasattr(gaussian_model, "max_sh_degree")
                else (sh_degree if sh_degree is not None else 3)
            ),
            campos=jnp.asarray(camera.camera_center),
            prefiltered=False,
            debug=self.config.get("debug", False),
            num_entries=num_entries,
            chunk=int(self.config.get("chunk", 1024)),
            antialias=bool(self.config.get("antialias", False)),
            # renderers are the inference surface (gs-render, mesh/pcd
            # extraction): default to the lean forward-only pipeline, which
            # drops the backward-only sort operand and rides f16-packed
            # color/opacity payloads. Trainers build their own settings
            # with need_grads=True; differentiating through a renderer
            # raises loudly unless config["need_grads"] is set.
            need_grads=bool(self.config.get("need_grads", False)),
            # median_id=False drops the gid sort operand but keeps the
            # median depth/weight outputs (median-ID reads 0) — set by
            # consumers that never read ids (mesh extraction); the
            # reference treats the id channel as an optional allmap
            # extension (surfel_renderer.py:112-117)
            with_median_id=bool(self.config.get("median_id", True)),
        )

    def _capacity(self, camera, xyz, opacity, scales, rotations, cov3d,
                  settings_probe) -> int:
        key = (int(camera.image_width), int(camera.image_height))
        cached = self._capacity_cache.get(key)
        if cached is not None:
            return cached
        cap = rast.suggest_num_entries(
            xyz, opacity, settings_probe, scales=scales, rotations=rotations,
            cov3D_precomp=cov3d,
        )
        self._capacity_cache[key] = cap
        return cap

    def _render_jitted(self, settings, xyz, opacity, shs, colors_precomp,
                       scales, rotations, cov3D_precomp, means2D_offset,
                       active_deg):
        """One fused jit per (static settings, arg-structure) key.

        The un-jitted rasterize pipeline dispatches hundreds of individual
        XLA ops; on a relay-attached TPU each dispatch costs ~4-6 ms, so a
        single 1080p view took seconds (bench_all's extract-mesh measured
        43 s/view). Array-valued settings fields (view/proj/campos/bg/
        intrinsics) become traced arguments so one compile serves every
        camera at a given resolution; the static remainder of
        RasterizeSettings keys the cache.
        """
        import jax

        active_key = None if active_deg is None else int(active_deg)
        key = (
            settings._replace(bg=None, viewmatrix=None, projmatrix=None,
                              campos=None,
                              intrinsics=settings.intrinsics is not None),
            shs is None, colors_precomp is None, scales is None,
            cov3D_precomp is None, active_key,
        )
        fn = self._jit_cache.get(key)
        if fn is None:
            template = key[0]

            @jax.jit
            def fn(xyz, opacity, shs, colors_precomp, scales, rotations,
                   cov3D_precomp, means2D_offset, view, proj, campos, bg,
                   intr):
                st = template._replace(
                    viewmatrix=view, projmatrix=proj, campos=campos, bg=bg,
                    intrinsics=intr,
                )
                return rast.rasterize(
                    xyz, opacity, st, shs=shs,
                    colors_precomp=colors_precomp, scales=scales,
                    rotations=rotations, cov3D_precomp=cov3D_precomp,
                    means2D_offset=means2D_offset,
                    active_sh_degree=active_key,
                )

            self._jit_cache[key] = fn
        return fn(xyz, opacity, shs, colors_precomp, scales, rotations,
                  cov3D_precomp, means2D_offset, settings.viewmatrix,
                  settings.projmatrix, settings.campos, settings.bg,
                  settings.intrinsics)

    def _dp_probe_settings(self, cameras, gaussian_model, settings_overrides,
                           probe_cams, xyz, opacity, scales, rotations,
                           cov3D_precomp):
        """Shared camera-DP settings builder: intersection capacity = max
        over up to ``probe_cams`` evenly-spaced views (so no view in the
        batch overflows); per-call ``settings_overrides`` applied last.
        One implementation for every renderer's dp closure — the probe
        logic must not fork between the vanilla and surfel paths."""
        probe = self.make_settings(cameras[0], gaussian_model, 4096)
        idx = list(range(0, len(cameras),
                         max(1, len(cameras) // max(1, probe_cams))))
        cap = 0
        for i in idx[:probe_cams]:
            c = cameras[i]
            p = probe._replace(
                viewmatrix=jnp.asarray(c.world_view_transform),
                projmatrix=jnp.asarray(c.full_proj_transform),
                campos=jnp.asarray(c.camera_center),
            )
            cap = max(cap, rast.suggest_num_entries(
                xyz, opacity, p, scales=scales, rotations=rotations,
                cov3D_precomp=cov3D_precomp))
        settings = probe._replace(num_entries=cap)
        if settings_overrides:
            settings = settings._replace(**settings_overrides)
        return settings

    def dp_render_closure(self, cameras, gaussian_model,
                          settings_overrides=None, probe_cams: int = 8):
        """Build ``(settings, render_fn)`` for the camera-DP batch renderers
        (parallel/render_dp.make_dp_render_fn / make_dp_fuse_fn).

        Gaussian properties are hoisted ONCE (valid only when
        ``view_dependent_gaussians`` is False); capacity is probed as the
        max over up to ``probe_cams`` evenly-spaced views so no view in the
        batch overflows. All cameras must share one resolution and FoV
        (callers group by (W, H, FoVx, FoVy))."""
        if self.view_dependent_gaussians:
            raise ValueError(
                f"{type(self).__name__} decodes gaussians per camera; "
                "camera-DP property hoisting is unsupported")
        (xyz, shs, colors_precomp, opacity, scales, rotations, cov3D_precomp) = (
            self.get_gaussians_properties(cameras[0], gaussian_model)
        )
        settings = self._dp_probe_settings(
            cameras, gaussian_model, settings_overrides, probe_cams,
            xyz, opacity, scales, rotations, cov3D_precomp)
        active_deg = getattr(gaussian_model, "active_sh_degree", None)
        active_key = (None if (active_deg is None or shs is None)
                      else int(active_deg))
        m2d = jnp.zeros((xyz.shape[0], 2), jnp.float32)

        def render_fn(s):
            return rast.rasterize(
                xyz, opacity, s, shs=shs, colors_precomp=colors_precomp,
                scales=scales, rotations=rotations,
                cov3D_precomp=cov3D_precomp, means2D_offset=m2d,
                active_sh_degree=active_key,
            )

        return settings, render_fn

    def render(self, viewpoint_camera, gaussian_model, means2D_offset=None,
               settings_overrides=None):
        """Port of renderers/base.py:10-63.

        ``settings_overrides`` applies per-call RasterizeSettings field
        overrides (e.g. ``{"with_median_id": False}`` from mesh extraction)
        without mutating the shared ``self.config`` — a second caller of the
        same renderer object keeps its configured behavior.
        """
        (xyz, shs, colors_precomp, opacity, scales, rotations, cov3D_precomp) = (
            self.get_gaussians_properties(viewpoint_camera, gaussian_model)
        )

        probe = self.make_settings(viewpoint_camera, gaussian_model, 4096)
        cap = self._capacity(
            viewpoint_camera, xyz, opacity, scales, rotations, cov3D_precomp, probe
        )
        settings = probe._replace(num_entries=cap)
        if settings_overrides:
            settings = settings._replace(**settings_overrides)

        if means2D_offset is None:
            means2D_offset = jnp.zeros((xyz.shape[0], 2), jnp.float32)

        active_deg = getattr(gaussian_model, "active_sh_degree", None)
        out = self._render_jitted(settings, xyz, opacity, shs, colors_precomp,
                                  scales, rotations, cov3D_precomp,
                                  means2D_offset,
                                  active_deg if shs is not None else None)

        # grow capacity for future frames if this one overflowed
        try:
            rendered = int(out["num_rendered"])
            if rendered > cap:
                key = (int(viewpoint_camera.image_width), int(viewpoint_camera.image_height))
                from gaustudio_tpu.ops.binning import bucket_capacity

                self._capacity_cache[key] = bucket_capacity(int(rendered * 1.25))
        except Exception:  # traced inside jit: skip host sync
            pass

        return {
            "render": out["render"],
            "rendered_depth": out["rendered_depth"],
            "rendered_median_depth": out["rendered_median_depth"],
            "rendered_median_weight": out["rendered_median_weight"],
            "rendered_median_id": out["rendered_median_id"],
            "viewspace_points": means2D_offset,
            "visibility_filter": out["radii"] > 0,
            "rendered_final_opacity": out["rendered_final_opacity"],
            "radii": out["radii"],
            "n_contrib": out["n_contrib"],
            "num_rendered": out["num_rendered"],
        }
