"""Public differentiable rasterization API.

The TPU-native counterpart of the reference Python rasterizer surface
(gaustudio_diff_gaussian_rasterization/__init__.py:160-223:
`GaussianRasterizationSettings`, `GaussianRasterizer`, `_RasterizeGaussians`)
— but as a pure function: no autograd.Function, no opaque state buffers;
differentiability comes from JAX autodiff through the preprocess math plus
the custom-VJP composite (rasterize_ref.composite).

Outputs (CHW, matching rasterize_points.cu:68-72 buffer layout):
    render [3,H,W], rendered_depth [1,H,W], rendered_median_depth [1,H,W],
    rendered_median_weight [1,H,W], rendered_median_id [1,H,W] (int32),
    rendered_final_opacity [1,H,W], radii [N] (int32), n_contrib internal.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaustudio_tpu.ops import binning, gaussian, rasterize_ref


class RasterizeSettings(NamedTuple):
    """Static + array rasterization settings.

    Mirrors GaussianRasterizationSettings
    (gaustudio_diff_gaussian_rasterization/__init__.py:160-172).  The
    static python ints (image size, sh degree, capacities) select the
    compiled program; the arrays are traced.
    """

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    bg: jnp.ndarray  # [3]
    scale_modifier: float = 1.0
    viewmatrix: jnp.ndarray = None  # [4,4] transposed W2V
    projmatrix: jnp.ndarray = None  # [4,4] transposed W2V @ P
    sh_degree: int = 3  # max degree present in shs
    campos: jnp.ndarray = None  # [3]
    prefiltered: bool = False
    debug: bool = False
    num_entries: int = 1 << 18  # static capacity of the intersection list
    chunk: int = 1024  # entries per compositing scan step
    backend: str = "auto"  # "auto" | "xla" | "pallas"
    # gsplat rasterize_mode="antialiased": 2D low-pass opacity compensation
    antialias: bool = False
    # with_median=False skips the median-depth outputs (and the gid sort
    # operand feeding median-id) — set by training, whose loss never reads
    # them; need_grads=False drops the backward-only slot sort operand on
    # pure inference paths (render scripts, benchmarks)
    with_median: bool = True
    need_grads: bool = True
    # with_median_id=False keeps the median depth/weight outputs but drops
    # the gid sort operand feeding median-ID (the reference surfel allmap
    # treats the id as an OPTIONAL extension: surfel_renderer.py:112-117
    # reads it only when len(allmap) > 7); the median_id output is then 0
    with_median_id: bool = True
    # gsplat-style projection (gsplat_renderer.py:38-66): [fx, fy, cx, cy]
    # pixel intrinsics replace the tanfov/projmatrix path in preprocess
    intrinsics: Optional[jnp.ndarray] = None


def rasterize(
    means3D,
    opacities,
    settings: RasterizeSettings,
    *,
    shs=None,
    colors_precomp=None,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    means2D_offset=None,
    active_sh_degree=None,
    valid_mask=None,
):
    """Differentiable 3DGS rasterization.

    Validation mirrors GaussianRasterizer.forward
    (gaustudio_diff_gaussian_rasterization/__init__.py:194-198): exactly one
    of (shs, colors_precomp) and exactly one of (scales+rotations,
    cov3D_precomp).

    ``means2D_offset`` replaces the reference's zero `screenspace_points`
    input: a [N,2] zeros array whose gradient equals the reference's
    viewspace_points gradient, *including* its x0.5W/x0.5H scaling
    convention (backward.cu:492-493, 577-581).
    """
    if (shs is None) == (colors_precomp is None):
        raise ValueError("Please provide exactly one of SHs or precomputed colors")
    if ((scales is None or rotations is None) and cov3D_precomp is None) or (
        scales is not None and cov3D_precomp is not None
    ):
        raise ValueError(
            "Please provide exactly one of scales/rotations or precomputed 3D covariance"
        )

    H, W = settings.image_height, settings.image_width
    grid_x = (W + gaussian.TILE_X - 1) // gaussian.TILE_X
    grid_y = (H + gaussian.TILE_Y - 1) // gaussian.TILE_Y

    opac = jnp.reshape(opacities, (-1,))

    # The reference's viewspace grad convention: gradients w.r.t. the
    # means2D input are pixel-space grads scaled by (0.5W, 0.5H).
    pix_offset = None
    if means2D_offset is not None:
        pix_offset = means2D_offset * jnp.asarray(
            [0.5 * W, 0.5 * H], means2D_offset.dtype
        )

    pre = gaussian.preprocess(
        means3D,
        opac,
        settings.viewmatrix,
        settings.projmatrix,
        settings.campos,
        W,
        H,
        settings.tanfovx,
        settings.tanfovy,
        antialias=settings.antialias,
        shs=shs,
        sh_degree=settings.sh_degree if active_sh_degree is None else active_sh_degree,
        colors_precomp=colors_precomp,
        scales=scales,
        rotations=rotations,
        cov3d_precomp=cov3D_precomp,
        scale_modifier=settings.scale_modifier,
        means2d_offset=pix_offset,
        valid_mask=valid_mask,
        intrinsics=settings.intrinsics,
    )

    pre_sg = jax.tree.map(
        lambda x: jax.lax.stop_gradient(x)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        pre,
    )

    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform != "cpu" else "xla"

    if backend == "pallas":
        from gaustudio_tpu.ops import binning_fast, rasterize_pallas

        binned_fast = binning_fast.bin_gaussians_fast(
            pre_sg, grid_x, grid_y, settings.num_entries,
            carry_gid=settings.with_median and settings.with_median_id,
            carry_slot=settings.need_grads,
            realign=settings.need_grads,  # inference composites from flat
        )
        out = rasterize_pallas.composite_fast(
            grid_x, grid_y, settings.chunk, settings.with_median,
            settings.need_grads, pre.means2d, pre.conic, pre.colors,
            pre.depths, pre.opacities, settings.bg, binned_fast,
        )
        num_rendered = binned_fast.num_rendered
    else:
        binned = binning.bin_gaussians(pre_sg, grid_x, grid_y, settings.num_entries)
        out = rasterize_ref.composite(
            grid_x,
            grid_y,
            settings.chunk,
            pre.means2d,
            pre.conic,
            pre.colors,
            pre.depths,
            pre.opacities,
            settings.bg,
            binned.gauss_id,
            binned.tile_id,
            binned.entry_valid,
            binned.tile_start,
        )
        num_rendered = binned.num_rendered

    to_img = lambda x: rasterize_ref.tiles_to_image(x, grid_x, grid_y, H, W)
    render = jnp.moveaxis(to_img(out.color), -1, 0)  # [3,H,W]
    depth = to_img(out.depth)[None]
    med_d = to_img(out.median_depth)[None]
    med_w = to_img(out.median_weight)[None]
    med_i = to_img(out.median_id)[None]
    final_T = to_img(out.final_T)
    n_contrib = to_img(out.n_contrib)

    if settings.debug:
        # Reference parity: debug=True dumps the kernel arguments for
        # offline repro when something goes wrong
        # (gaustudio_diff_gaussian_rasterization/__init__.py:83-90). The
        # TPU analogue: a host callback that snapshots inputs+outputs to
        # ``snapshot_fw.dump`` whenever any of them is non-finite.
        from gaustudio_tpu.utils import observability

        def _debug_snapshot(tree):
            import os as _os

            observability.snapshot_on_nonfinite(
                tree,
                _os.environ.get("GS_DEBUG_SNAPSHOT", "snapshot_fw.dump"),
                context="rasterize forward (debug=True)",
            )

        jax.debug.callback(
            _debug_snapshot,
            {
                "inputs": {
                    "means3D": means3D, "opacities": opac, "shs": shs,
                    "colors_precomp": colors_precomp, "scales": scales,
                    "rotations": rotations, "cov3D_precomp": cov3D_precomp,
                    "viewmatrix": settings.viewmatrix,
                    "projmatrix": settings.projmatrix,
                },
                "outputs": {"render": render, "depth": depth,
                            "final_T": final_T},
            },
        )

    return {
        "render": render,
        "rendered_depth": depth,
        "rendered_median_depth": med_d,
        "rendered_median_weight": med_w,
        "rendered_median_id": jax.lax.stop_gradient(med_i).astype(jnp.int32)[...],
        "rendered_final_opacity": (1.0 - final_T)[None],
        "radii": pre.radii,
        "n_contrib": n_contrib,
        "num_rendered": num_rendered,
    }


def suggest_num_entries(
    means3D,
    opacities,
    settings: RasterizeSettings,
    *,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    margin: float = 1.15,
    minimum: int = 4096,
) -> int:
    """Host-side capacity probe: measure the true intersection count for a
    view and bucket it to a power of two (with headroom for training motion).

    The TPU substitute for the reference's dynamic buffer resize + D2H
    ``num_rendered`` sync (rasterizer_impl.cu:280-292).
    """
    H, W = settings.image_height, settings.image_width
    pre = gaussian.preprocess(
        means3D,
        jnp.reshape(opacities, (-1,)),
        settings.viewmatrix,
        settings.projmatrix,
        settings.campos,
        W,
        H,
        settings.tanfovx,
        settings.tanfovy,
        antialias=settings.antialias,
        colors_precomp=jnp.zeros((means3D.shape[0], 3), means3D.dtype),
        scales=scales,
        rotations=rotations,
        cov3d_precomp=cov3D_precomp,
        scale_modifier=settings.scale_modifier,
        intrinsics=settings.intrinsics,
    )
    # +1-slot floor per gaussian: the fast binning allocates one slot even
    # to culled / zero-tile gaussians (expand-window invariant), so the
    # bucket must cover sum(max(tiles, 1)), not just the intersection count
    total = int(jnp.sum(jnp.maximum(pre.tiles_touched, 1)))
    cap = binning.bucket_capacity(int(total * margin), minimum)
    return cap


def mark_visible(positions, viewmatrix, projmatrix):
    """GaussianRasterizer.markVisible parity
    (gaustudio_diff_gaussian_rasterization/__init__.py:179-188)."""
    return gaussian.mark_visible(positions, viewmatrix, projmatrix)
