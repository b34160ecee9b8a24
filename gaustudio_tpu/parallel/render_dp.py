"""Camera-DP batched rendering + multi-view TSDF fusion with psum reduction.

The mesh-extraction hot loop (scripts/extract_mesh.py:95-117) parallelized
over views: each dp row renders its camera and integrates its depth map
into a local TSDF; volumes weighted-average-reduce with ``psum`` over ICI
(SURVEY.md §2.3 "Camera-DP").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaustudio_tpu.ops import tsdf
from gaustudio_tpu.ops.rasterize import RasterizeSettings


class RenderCamera(NamedTuple):
    """Stacked per-view arrays (leading axis = number of views)."""

    viewmatrix: jnp.ndarray  # [B, 4, 4]
    projmatrix: jnp.ndarray  # [B, 4, 4]
    campos: jnp.ndarray  # [B, 3]
    intrinsics: jnp.ndarray  # [B, 3, 3]
    world_to_cam: jnp.ndarray  # [B, 4, 4]
    valid: jnp.ndarray = None  # [B] 1.0 real view / 0.0 pad (optional)


def stack_cameras(cameras, pad_to: int = 0) -> RenderCamera:
    """Stack Camera objects into a RenderCamera, padding to a multiple of
    ``pad_to`` with valid=0 repeats of the first view (a padded row renders
    normally but its depth is zeroed before TSDF integration, so it
    contributes nothing — tsdf.integrate treats depth <= 0 as invalid)."""
    n = len(cameras)
    total = n if pad_to <= 0 else -(-n // pad_to) * pad_to
    idx = list(range(n)) + [0] * (total - n)
    return RenderCamera(
        viewmatrix=jnp.stack(
            [jnp.asarray(cameras[i].world_view_transform) for i in idx]),
        projmatrix=jnp.stack(
            [jnp.asarray(cameras[i].full_proj_transform) for i in idx]),
        campos=jnp.stack(
            [jnp.asarray(cameras[i].camera_center) for i in idx]),
        intrinsics=jnp.stack(
            [jnp.asarray(cameras[i].intrinsics) for i in idx]),
        world_to_cam=jnp.stack(
            [jnp.asarray(cameras[i].extrinsics) for i in idx]),
        valid=jnp.asarray(
            [1.0] * n + [0.0] * (total - n), jnp.float32),
    )


def make_dp_render_fn(mesh: Mesh, settings: RasterizeSettings, render_fn):
    """Batch-render views over the dp axis.

    ``render_fn(settings) -> dict`` is a closure over the gaussian data
    (e.g. lambda s: rasterize(..., s)); cameras are sharded over dp.
    """

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp"),), out_specs=P("dp"),
        check_vma=False,
    )
    def render(cams: RenderCamera):
        def one(cam):
            s = settings._replace(
                viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
                campos=cam.campos,
            )
            # pass the image buffers through: render_fn may be the vanilla
            # rasterizer (rendered_depth/median/opacity) or the 2DGS surfel
            # one (rendered_normal_view/depth_sum/dist_*). Per-gaussian
            # outputs (radii, viewspace grads) are dropped — stacking [N]
            # arrays per view would haul them over ICI for no consumer.
            out = render_fn(s)
            return {k: v for k, v in out.items()
                    if k == "render" or k.startswith("rendered_")}

        return jax.lax.map(one, cams)

    return jax.jit(render)


def make_dp_fuse_fn(mesh: Mesh, settings: RasterizeSettings, render_fn):
    """Render + TSDF-integrate a batch of views, psum-reducing the volume.

    Returns a jitted fn (volume, cams) -> volume where cams' leading axis is
    sharded over dp; each device integrates its local views into a private
    (tsdf*weight, weight) accumulator which is psum-merged at the end.
    """

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("dp")), out_specs=P(),
        check_vma=False,
    )
    def fuse(volume: tsdf.TSDFVolume, cams: RenderCamera):
        def body(vol, cam):
            s = settings._replace(
                viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
                campos=cam.campos,
            )
            out = render_fn(s)
            depth = out["rendered_median_depth"][0]
            opacity = out["rendered_final_opacity"][0]
            depth = jnp.where(opacity < 0.5, 0.0, depth)
            if cam.valid is not None:
                depth = depth * cam.valid  # pad views integrate nothing
            vol = tsdf.integrate(vol, depth, cam.intrinsics, cam.world_to_cam)
            return vol, None

        local_empty = volume._replace(
            tsdf=jnp.ones_like(volume.tsdf), weight=jnp.zeros_like(volume.weight)
        )
        local, _ = jax.lax.scan(body, local_empty, cams)

        # merge: weighted average over dp (+ the carried-in volume)
        num = jax.lax.psum(local.tsdf * local.weight, "dp")
        den = jax.lax.psum(local.weight, "dp")
        num = num + volume.tsdf * volume.weight
        den = den + volume.weight
        merged = jnp.where(den > 0, num / jnp.maximum(den, 1e-9), 1.0)
        return volume._replace(tsdf=merged, weight=den)

    return jax.jit(fuse)
