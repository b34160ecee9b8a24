"""2DGS surfel rasterization (ray-splat intersection) — XLA streaming path.

TPU-native re-design of the external ``diff_surfel_rasterization`` CUDA
kernels the reference's surfel renderer depends on
(gaustudio/renderers/surfel_renderer.py:66-117): each splat is a 2D
Gaussian disk in its tangent plane; per pixel the camera ray is intersected
with the splat plane via the two-plane (hu, hv) construction of the 2DGS
paper, with a 2D screen-space low-pass fallback ``G = max(G_surf, G_2d)``.

Emits the surfel buffer contract the reference decodes
(surfel_renderer.py:96-117): RGB, accumulated alpha, view-space normal map,
expected depth (alpha-weighted sum; caller divides by alpha), median depth
/ weight / id, plus the two distortion-loss accumulators (sum w*m, sum
w*m^2) used by 2DGS regularization.

Shares the associative compositing machinery of rasterize_ref; the full
pipeline is differentiable through jax.grad (chunk bodies are
rematerialized via jax.checkpoint).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops import binning
from gaustudio_tpu.ops import sh as sh_ops
from gaustudio_tpu.ops.gaussian import (
    NEAR_CULL_Z,
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
    get_rect,
    ndc2pix,
    quat_to_rotmat,
    transform_dirs,
    transform_points,
)
from gaustudio_tpu.ops.rasterize_ref import (
    _seg_combine_prod,
    _seg_flags,
    _pixel_grid,
    tiles_to_image,
)

_TERM_EPS = 1e-4
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99
# screen-space low-pass sigma^2 (the 2DGS 2D filter; ~sqrt(2)/2 px sigma)
_FILTER_2D_VAR = 2.0
_FAR_N = 1e8


class SurfelPre(NamedTuple):
    valid: jnp.ndarray  # [N]
    depths: jnp.ndarray  # [N] center view depth
    mean2d: jnp.ndarray  # [N, 2] projected center (pixels)
    M: jnp.ndarray  # [N, 3, 3] rows (Mx, My, Mw): uv1 -> pixel homogeneous
    Dk: jnp.ndarray  # [N, 3] view-depth coefficients over (u, v, 1)
    normal_view: jnp.ndarray  # [N, 3] splat normal in view space
    opacities: jnp.ndarray  # [N]
    colors: jnp.ndarray  # [N, 3]
    radii: jnp.ndarray  # [N] int32
    rect_min: jnp.ndarray
    rect_max: jnp.ndarray
    tiles_touched: jnp.ndarray


def preprocess_surfel(
    means3d, opacities, viewmatrix, projmatrix, campos,
    image_width: int, image_height: int,
    *, scales, rotations, shs=None, sh_degree=3, colors_precomp=None,
    scale_modifier=1.0, means2d_offset=None, valid_mask=None,
) -> SurfelPre:
    """Per-splat setup: tangent frame -> pixel-space homography."""
    grid_x = (image_width + TILE_X - 1) // TILE_X
    grid_y = (image_height + TILE_Y - 1) // TILE_Y
    W, H = image_width, image_height

    R = quat_to_rotmat(rotations, normalize=True)  # [N, 3, 3] rows = axes?
    # columns of R are the rotated basis vectors: t_u = R[:, :, 0] etc.
    su = scales[:, 0] * scale_modifier
    sv = scales[:, 1] * scale_modifier
    tu = R[..., :, 0] * su[:, None]  # [N, 3] world tangent u
    tv = R[..., :, 1] * sv[:, None]
    nrm = R[..., :, 2]

    p_view = transform_points(means3d, viewmatrix)[..., :3]
    depths = p_view[..., 2]
    in_front = depths > NEAR_CULL_Z

    # S rows: images of (u,v,1) under the full projective transform
    # (scalarized transforms: f32 `@` would run in bf16 on the TPU MXU)
    Su = transform_dirs(tu, projmatrix)  # direction: no translation row
    Sv = transform_dirs(tv, projmatrix)
    Sp = transform_points(means3d, projmatrix)

    def pix_rows(S):
        # px*w = 0.5W*(x+w) - 0.5*w ; py*w = 0.5H*(y+w) - 0.5*w
        mx = 0.5 * W * (S[..., 0] + S[..., 3]) - 0.5 * S[..., 3]
        my = 0.5 * H * (S[..., 1] + S[..., 3]) - 0.5 * S[..., 3]
        return mx, my, S[..., 3]

    mxu, myu, mwu = pix_rows(Su)
    mxv, myv, mwv = pix_rows(Sv)
    mxp, myp, mwp = pix_rows(Sp)
    # M[:, row, k]: row 0 = Mx coefficients over (u, v, 1)
    M = jnp.stack(
        [
            jnp.stack([mxu, mxv, mxp], -1),
            jnp.stack([myu, myv, myp], -1),
            jnp.stack([mwu, mwv, mwp], -1),
        ],
        axis=-2,
    )

    # view-space depth coefficients over (u, v, 1)
    Rv = viewmatrix[:3, :3]
    tu_v = transform_dirs(tu, Rv)
    tv_v = transform_dirs(tv, Rv)
    Dk = jnp.stack([tu_v[..., 2], tv_v[..., 2], depths], -1)
    normal_view = transform_dirs(nrm, Rv)

    # projected center + conservative screen radius from the projected axes
    w_c = mwp + 1e-7
    cx = mxp / w_c
    cy = myp / w_c
    mean2d = jnp.stack([cx, cy], -1)
    if means2d_offset is not None:
        mean2d = mean2d + means2d_offset
        cx, cy = mean2d[..., 0], mean2d[..., 1]

    # extent: |projected axis endpoints - center| (conservative 3-sigma)
    def axis_extent(mx, my, mw):
        ex = (mxp + mx) / (w_c + mw) - cx
        ey = (myp + my) / (w_c + mw) - cy
        return jnp.sqrt(ex * ex + ey * ey)

    r_u = axis_extent(mxu, myu, mwu)
    r_v = axis_extent(mxv, myv, mwv)
    radius = jnp.ceil(3.0 * jnp.maximum(jnp.maximum(r_u, r_v), 2.0))

    rect_min, rect_max = get_rect(mean2d, radius, grid_x, grid_y)
    rect_wh = rect_max - rect_min
    tiles = rect_wh[..., 0] * rect_wh[..., 1]

    valid = in_front & (tiles > 0) & jnp.isfinite(radius)
    if valid_mask is not None:
        valid = valid & valid_mask

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        colors, _ = sh_ops.sh_to_rgb_clamped(sh_degree, shs, means3d, campos)

    return SurfelPre(
        valid=valid,
        depths=depths,
        mean2d=mean2d,
        M=M,
        Dk=Dk,
        normal_view=normal_view,
        opacities=jnp.reshape(opacities, (-1,)),
        colors=colors,
        radii=jnp.where(valid, radius, 0).astype(jnp.int32),
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=jnp.where(valid, tiles, 0).astype(jnp.int32),
    )


def _surfel_alpha(M, Dk, mean2d, opac, valid, tile, grid_x):
    """Per (entry, pixel): ray-splat alpha + intersection depth."""
    px, py = _pixel_grid(tile, grid_x)  # (C, 256)
    # plane equations hu = x*Mw - Mx, hv = y*Mw - My, each (C, 256, 3)
    Mx = M[:, 0, :][:, None, :]
    My = M[:, 1, :][:, None, :]
    Mw = M[:, 2, :][:, None, :]
    hu = px[..., None] * Mw - Mx
    hv = py[..., None] * Mw - My
    s = jnp.cross(hu, hv)  # (C, 256, 3)
    sz = jnp.where(jnp.abs(s[..., 2]) < 1e-9, 1e-9, s[..., 2])
    u = s[..., 0] / sz
    v = s[..., 1] / sz
    rho3d = u * u + v * v

    dx = mean2d[:, 0:1] - px
    dy = mean2d[:, 1:2] - py
    rho2d = (dx * dx + dy * dy) / _FILTER_2D_VAR

    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    G = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(_ALPHA_MAX, opac[:, None] * G)
    alpha = jnp.where((alpha < _ALPHA_MIN) | ~valid[:, None], 0.0, alpha)

    # 2D low-pass branch uses the CENTER depth (reference 2DGS semantics:
    # diff-surfel forward `depth = (rho3d <= rho2d) ? s.Tw+Tw.z : Tw.z`).
    # Routing depth through (u, v) on the 2D branch is also numerically
    # catastrophic for gradients when the splat is edge-on (s_z ~ 0).
    depth = jnp.where(
        use3d,
        Dk[:, 0][:, None] * u + Dk[:, 1][:, None] * v + Dk[:, 2][:, None],
        Dk[:, 2][:, None],
    )
    # behind-camera intersections get no contribution
    alpha = jnp.where(depth > NEAR_CULL_Z, alpha, 0.0)
    return alpha, depth


class SurfelOut(NamedTuple):
    color: jnp.ndarray  # [T1, 256, 3]
    depth: jnp.ndarray  # [T1, 256] sum w * depth (divide by alpha outside)
    normal: jnp.ndarray  # [T1, 256, 3] view-space
    median_depth: jnp.ndarray
    median_weight: jnp.ndarray
    median_id: jnp.ndarray
    final_T: jnp.ndarray
    dist_m1: jnp.ndarray  # [T1, 256] sum w * m
    dist_m2: jnp.ndarray  # [T1, 256] sum w * m^2


def composite_surfel(grid_x, grid_y, chunk, pre: SurfelPre, binned) -> SurfelOut:
    """Chunked segmented-scan compositor for surfels (cf. rasterize_ref)."""
    num_tiles = grid_x * grid_y
    T1 = num_tiles + 1
    K = binned.gauss_id.shape[0]
    n_chunks = K // chunk

    init = dict(
        T=jnp.ones((T1, TILE_PIXELS), jnp.float32),
        # sticky per-pixel termination (see rasterize_ref._composite_fwd_impl)
        alive=jnp.ones((T1, TILE_PIXELS), jnp.bool_),
        C=jnp.zeros((T1, TILE_PIXELS, 3), jnp.float32),
        D=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        Nrm=jnp.zeros((T1, TILE_PIXELS, 3), jnp.float32),
        med_d=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        med_w=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        med_i=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        m1=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        m2=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
    )

    @jax.checkpoint
    def body(state, ci):
        base = ci * chunk
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, base, chunk)
        g = sl(binned.gauss_id)
        t = sl(binned.tile_id)
        vld = sl(binned.entry_valid)

        alpha, depth = _surfel_alpha(
            pre.M[g], pre.Dk[g], pre.mean2d[g], pre.opacities[g],
            pre.valid[g] & vld, t, grid_x,
        )
        col = pre.colors[g]
        nrm = pre.normal_view[g]

        flags = jnp.broadcast_to(_seg_flags(t)[:, None], alpha.shape)
        segprod, _ = jax.lax.associative_scan(
            _seg_combine_prod, (1.0 - alpha, flags), axis=0
        )
        T_carry = state["T"][t]
        P_incl = T_carry * segprod
        P_excl = jnp.where(alpha > 0.0, P_incl / (1.0 - alpha), P_incl)
        applied = (P_incl >= _TERM_EPS) & state["alive"][t]
        w = jnp.where(applied, alpha * P_excl, 0.0)

        seg = lambda data: jax.ops.segment_sum(
            data, t, num_segments=T1, indices_are_sorted=True
        )
        state["C"] = state["C"] + seg(w[..., None] * col[:, None, :])
        state["D"] = state["D"] + seg(w * depth)
        state["Nrm"] = state["Nrm"] + seg(w[..., None] * nrm[:, None, :])
        state["m1"] = state["m1"] + seg(w * depth)
        state["m2"] = state["m2"] + seg(w * depth * depth)

        T_min = jax.ops.segment_min(
            jnp.where(applied, P_incl, jnp.inf), t, num_segments=T1,
            indices_are_sorted=True,
        )
        state["T"] = jnp.minimum(state["T"], T_min)
        P_end = jax.ops.segment_min(
            P_incl, t, num_segments=T1, indices_are_sorted=True
        )
        state["alive"] = state["alive"] & (P_end >= _TERM_EPS)

        cross = applied & (alpha > 0.0) & (P_excl > 0.5) & (P_incl < 0.5)
        crossed = seg(cross.astype(jnp.float32)) > 0.0
        state["med_d"] = jnp.where(crossed, seg(jnp.where(cross, depth, 0.0)),
                                   state["med_d"])
        state["med_w"] = jnp.where(crossed, seg(jnp.where(cross, alpha * P_excl, 0.0)),
                                   state["med_w"])
        state["med_i"] = jnp.where(
            crossed, seg(jnp.where(cross, g[:, None].astype(jnp.float32), 0.0)),
            state["med_i"],
        )
        return state, None

    state, _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    return SurfelOut(
        color=state["C"], depth=state["D"], normal=state["Nrm"],
        median_depth=state["med_d"], median_weight=state["med_w"],
        median_id=state["med_i"], final_T=state["T"],
        dist_m1=state["m1"], dist_m2=state["m2"],
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def composite_surfel_fast(grid_x, grid_y, need_grads, with_median, M, Dk,
                          mean2d,
                          opacities, colors, normal_view, binned):
    """Pallas surfel compositor with a custom VJP.

    The kernel reads entry data from ``binned`` (built from stop-gradiented
    preprocess outputs); the explicit array args exist to receive the
    gradients computed by the Pallas reverse-walk backward."""
    from gaustudio_tpu.ops import rasterize_surfel_pallas as SP

    return SP.composite_surfel_pallas(binned, grid_x, grid_y,
                                      use_flat=not need_grads,
                                      with_median=with_median,
                                      with_nc=need_grads)


def _csf_fwd(grid_x, grid_y, need_grads, with_median, M, Dk, mean2d,
             opacities, colors, normal_view, binned):
    packed = composite_surfel_fast(grid_x, grid_y, need_grads, with_median,
                                   M, Dk, mean2d, opacities, colors,
                                   normal_view, binned)
    return packed, (binned, packed[:, 10, :], packed[:, 12, :])


def _csf_bwd(grid_x, grid_y, need_grads, with_median, res, dp):
    from gaustudio_tpu.ops import rasterize_surfel_pallas_bwd as SB

    if not need_grads:
        raise ValueError(
            "differentiating a surfel render built with need_grads=False: "
            "the binning dropped the slot operand the backward reduction "
            "needs (set RasterizeSettings.need_grads=True for training)"
        )
    binned, final_T, n_contrib = res
    # packed rows: 0-2 C, 3 depth-sum (fans out to depth AND m1 so its
    # cotangent already sums both), 4-6 normal, 7 med_d, 8 med_w, 9 med_i,
    # 10 final_T, 11 m2, 12 n_contrib. alpha output = 1 - T_f => dA = -dTf.
    ct_tiles = jnp.concatenate(
        [
            dp[:, 0:3, :],  # dCr dCg dCb
            dp[:, 3:4, :],  # dDsum (depth + m1)
            dp[:, 11:12, :],  # dm2
            dp[:, 4:7, :],  # dN
            -dp[:, 10:11, :],  # dA
            dp[:, 7:8, :],  # dMed
            final_T[:, None, :],
            n_contrib[:, None, :],
        ],
        axis=1,
    )
    grads_flat = SB.composite_surfel_backward_pallas(binned, ct_tiles,
                                                     grid_x, grid_y)
    dM, dDk, dop, dcol, dnrm, dmean2d = SB.reduce_surfel_entry_grads(
        grads_flat, binned, res[0].compact_gid.shape[0]
    )
    return (dM, dDk, dmean2d, dop, dcol, dnrm, None)


composite_surfel_fast.defvjp(_csf_fwd, _csf_bwd)


def rasterize_surfels(
    means3D, opacities, settings, *, scales, rotations, shs=None,
    colors_precomp=None, means2D_offset=None, active_sh_degree=None,
    valid_mask=None,
):
    """Full 2DGS rasterization returning the surfel buffer dict."""
    H, W = settings.image_height, settings.image_width
    grid_x = (W + TILE_X - 1) // TILE_X
    grid_y = (H + TILE_Y - 1) // TILE_Y

    pix_offset = None
    if means2D_offset is not None:
        pix_offset = means2D_offset * jnp.asarray([0.5 * W, 0.5 * H])

    pre = preprocess_surfel(
        means3D, opacities, settings.viewmatrix, settings.projmatrix,
        settings.campos, W, H, scales=scales, rotations=rotations, shs=shs,
        sh_degree=settings.sh_degree if active_sh_degree is None else active_sh_degree,
        colors_precomp=colors_precomp, scale_modifier=settings.scale_modifier,
        means2d_offset=pix_offset, valid_mask=valid_mask,
    )
    from gaustudio_tpu.ops.gaussian import Preprocessed

    pre_bin = Preprocessed(
        valid=pre.valid, depths=jax.lax.stop_gradient(pre.depths),
        means2d=jax.lax.stop_gradient(pre.mean2d),
        conic=jnp.zeros_like(pre.mean2d[:, :1]),
        opacities=pre.opacities, colors=pre.colors, radii=pre.radii,
        rect_min=pre.rect_min, rect_max=pre.rect_max,
        tiles_touched=pre.tiles_touched,
    )
    backend = settings.backend
    on_tpu = jax.devices()[0].platform != "cpu"
    if backend == "auto":
        # TPU defaults to the full Pallas path (5x the XLA compositor
        # forward, differentiable via composite_surfel_fast's custom_vjp
        # reverse-walk backward); CPU uses the XLA golden path.
        backend = "pallas" if on_tpu else "xla"
    if backend == "pallas":
        # full Pallas path (24-row entry layout + per-tile compositor),
        # differentiable through composite_surfel_fast's custom_vjp
        # (Pallas reverse-walk backward + per-gaussian reduction)
        from gaustudio_tpu.ops import rasterize_surfel_pallas as SP

        pre_sg = jax.tree.map(
            lambda x: jax.lax.stop_gradient(x)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            pre,
        )
        sb = SP.bin_surfels_fast(pre_sg, grid_x, grid_y, settings.num_entries,
                                 carry_slot=settings.need_grads,
                                 realign=settings.need_grads,
                                 carry_gid=settings.with_median
                                 and settings.with_median_id)
        packed = composite_surfel_fast(
            grid_x, grid_y, settings.need_grads, settings.with_median,
            pre.M, pre.Dk, pre.mean2d,
            pre.opacities, pre.colors, pre.normal_view, sb,
        )
        pad1 = lambda x, v=0.0: jnp.concatenate(
            [x, jnp.full((1,) + x.shape[1:], v, x.dtype)], axis=0
        )
        out = SurfelOut(
            color=pad1(packed[:, 0:3, :].transpose(0, 2, 1)),
            depth=pad1(packed[:, 3, :]),
            normal=pad1(packed[:, 4:7, :].transpose(0, 2, 1)),
            median_depth=pad1(packed[:, 7, :]),
            median_weight=pad1(packed[:, 8, :]),
            median_id=pad1(packed[:, 9, :]),
            final_T=pad1(packed[:, 10, :], 1.0),
            dist_m1=pad1(packed[:, 3, :]),
            dist_m2=pad1(packed[:, 11, :]),
        )
        num_rendered = sb.num_rendered
    else:
        if on_tpu:
            # XLA compositor (differentiable) but FAST binning: the
            # searchsorted/gather binning costs hundreds of ms at scale on
            # XLA-TPU. The exact-alpha cull inside is disabled by the
            # all-zero conic (power 0 -> keep alpha = op), conservative
            # and parity-safe.
            from gaustudio_tpu.ops import binning_fast

            # fully stop-gradient the binning inputs: binning only routes
            # entry ids; grads flow through composite_surfel's gathers.
            # (Without this, jax.grad hits the Pallas expand kernel's
            # missing JVP rule via the differentiable opacities/colors.)
            pre_fast = jax.tree.map(
                lambda x: jax.lax.stop_gradient(x)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                pre_bin._replace(
                    conic=jnp.zeros((pre.mean2d.shape[0], 3), jnp.float32),
                ),
            )
            bf = binning_fast.bin_gaussians_fast(
                pre_fast, grid_x, grid_y, settings.num_entries,
                realign=False,  # only compat_arrays are consumed
            )
            gid, tile, valid_e, tile_start = binning_fast.compat_arrays(
                bf, grid_x, grid_y
            )
            binned = binning.Binned(
                gauss_id=gid, tile_id=tile, entry_valid=valid_e,
                tile_start=tile_start,
                tile_count=bf.tile_count, num_rendered=bf.num_rendered,
            )
        else:
            binned = binning.bin_gaussians(pre_bin, grid_x, grid_y,
                                           settings.num_entries)
        out = composite_surfel(grid_x, grid_y, settings.chunk, pre, binned)
        num_rendered = binned.num_rendered

    to_img = lambda x: tiles_to_image(x, grid_x, grid_y, H, W)
    alpha_img = (1.0 - to_img(out.final_T))[None]
    return {
        "render": jnp.moveaxis(to_img(out.color), -1, 0),
        "rendered_alpha": alpha_img,
        "rendered_normal_view": jnp.moveaxis(to_img(out.normal), -1, 0),
        "rendered_depth_sum": to_img(out.depth)[None],
        "rendered_median_depth": to_img(out.median_depth)[None],
        "rendered_median_weight": to_img(out.median_weight)[None],
        "rendered_median_id": jax.lax.stop_gradient(
            to_img(out.median_id)
        ).astype(jnp.int32)[None],
        "rendered_dist_m1": to_img(out.dist_m1)[None],
        "rendered_dist_m2": to_img(out.dist_m2)[None],
        "radii": pre.radii,
        "num_rendered": num_rendered,
    }
