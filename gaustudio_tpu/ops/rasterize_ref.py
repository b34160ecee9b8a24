"""Tile compositing — XLA streaming implementation (the golden model).

TPU-native re-design of the forward/backward render kernels
(cuda_rasterizer/forward.cu:261-397, backward.cu:415-610).  Instead of one
CUDA thread block per tile with shared-memory staging, the sorted
intersection-entry stream is processed in fixed-size chunks by a
``lax.scan``; per-pixel front-to-back compositing state lives in a
``(num_tiles+1, 256)`` array carried across chunks.

The sequential alpha-blending recurrence is reformulated associatively:
with per-entry ``alpha`` (zeroed by the ``power>0`` / ``alpha<1/255`` skip
rules, forward.cu:346-355) and the *segmented* running product
``P_i = T_in * prod_(j<=i, same tile) (1 - alpha_j)``, the CUDA semantics
map exactly to masks:

  * entry i is applied            iff  P_i >= 1e-4      (forward.cu:356-361:
    the sticky ``done`` flag equals the monotone product crossing 1e-4)
  * contribution weight           w_i = alpha_i * P_{i-1} * applied_i
  * final transmittance           T_out = min over applied P_i  (monotone)
  * median crossing (forward.cu:368-374)  P_{i-1} > 0.5 and P_i < 0.5

so each chunk needs only one segmented product scan (log-depth, fully
vectorized over the chunk x 256 pixels) plus segment reductions — no
sequential per-gaussian loop, no atomics.

The backward is a mirrored *reverse* chunk scan reconstructing the
transmittance by division (backward.cu:535: ``test_T = T / (1 - alpha)``)
and the behind-the-entry suffix accumulators (``accum_rec``,
backward.cu:550-580) as segmented suffix sums; per-Gaussian gradients are
scatter-adds instead of atomicAdd.  It reproduces the reference's gradient
conventions bit-for-bit in structure: the background term of
backward.cu:584-587, the median-depth routing of backward.cu:566-569, the
``n_contrib`` gating of backward.cu:521-524, and the (deliberate) omission
of the alpha<=0.99 clamp from the opacity gradient (backward.cu:533,598).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops.gaussian import TILE_X, TILE_Y, TILE_PIXELS

_TERM_EPS = 1e-4  # forward.cu:357
_ALPHA_MIN = 1.0 / 255.0  # forward.cu:354
_ALPHA_MAX = 0.99  # forward.cu:353
_MEDIAN_DEFAULT = 15.0  # forward.cu:310


class CompositeOut(NamedTuple):
    color: jnp.ndarray  # [T1, 256, 3]
    depth: jnp.ndarray  # [T1, 256]
    median_depth: jnp.ndarray  # [T1, 256]
    median_weight: jnp.ndarray  # [T1, 256]
    median_id: jnp.ndarray  # [T1, 256] float ids (reference stores floats)
    final_T: jnp.ndarray  # [T1, 256]
    n_contrib: jnp.ndarray  # [T1, 256] int32


def _seg_combine_prod(a, b):
    va, fa = a
    vb, fb = b
    return jnp.where(fb, vb, va * vb), fa | fb


def _seg_combine_sum(a, b):
    va, fa = a
    vb, fb = b
    return jnp.where(fb, vb, va + vb), fa | fb


def _pixel_grid(tile, grid_x):
    """Per-entry pixel coordinates of its 16x16 tile -> (C, 256) each."""
    tx = (tile % grid_x).astype(jnp.float32)
    ty = (tile // grid_x).astype(jnp.float32)
    q = jnp.arange(TILE_PIXELS, dtype=jnp.float32)
    qx = q % TILE_X
    qy = q // TILE_X
    px = tx[:, None] * TILE_X + qx[None, :]
    py = ty[:, None] * TILE_Y + qy[None, :]
    return px, py


def _chunk_alpha(mean2d, conic, opac, valid, tile, grid_x):
    """Alpha of each chunk entry against the 256 pixels of its tile.

    Implements the Gaussian falloff + skip rules of forward.cu:340-355.
    Returns (alpha [C,256], G [C,256], dx, dy).
    """
    px, py = _pixel_grid(tile, grid_x)
    dx = mean2d[:, 0:1] - px
    dy = mean2d[:, 1:2] - py
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(_ALPHA_MAX, opac[:, None] * G)
    alpha = jnp.where(
        (power > 0.0) | (alpha < _ALPHA_MIN) | ~valid[:, None], 0.0, alpha
    )
    return alpha, G, dx, dy


def _seg_flags(tile):
    first = jnp.ones((1,), dtype=bool)
    rest = tile[1:] != tile[:-1]
    return jnp.concatenate([first, rest])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def composite(grid_x, grid_y, chunk, means2d, conic, colors, depths,
              opacities, bg, gid, tile, valid, tile_start):
    """Front-to-back composite of sorted intersection entries.

    Args (arrays; K = entry capacity, N = gaussians, T1 = grid_x*grid_y+1):
        means2d [N,2], conic [N,3], colors [N,3], depths [N], opacities [N]:
            per-gaussian screen-space data from preprocess.
        bg [3]: background color — NOT composited in the forward (parity with
            forward.cu:385-396 where bg is unused) but included in the
            backward's alpha gradient (backward.cu:584-587).
        gid/tile/valid [K]: sorted entries (tile == grid_x*grid_y padding).
        tile_start [T1-1]: first entry index of each tile.

    Returns CompositeOut with tile-major pixel layout.
    """
    out, _ = _composite_fwd_impl(
        grid_x, grid_y, chunk, means2d, conic, colors, depths, opacities,
        gid, tile, valid, tile_start,
    )
    return out


def _composite_fwd_impl(grid_x, grid_y, chunk, means2d, conic, colors,
                        depths, opacities, gid, tile, valid, tile_start):
    num_tiles = grid_x * grid_y
    T1 = num_tiles + 1
    K = gid.shape[0]
    assert K % chunk == 0, f"entry capacity {K} must be a multiple of {chunk}"
    n_chunks = K // chunk

    init = dict(
        T=jnp.ones((T1, TILE_PIXELS), jnp.float32),
        # sticky per-pixel termination (forward.cu:361-365's ``done`` flag).
        # T carries the last APPLIED transmittance (always >= eps); without
        # the flag a pixel whose cumulative product crossed eps inside one
        # chunk would resume compositing in the next chunk (T_carry >= eps
        # restarts the product), applying entries the CUDA semantics skips.
        # The backward reconstructs T by re-multiplying 1/(1-alpha) over ALL
        # alpha>0 entries below n_contrib, so any skipped-yet-counted
        # stretch with opaque entries inflates its reconstruction by
        # 1/(1-alpha) per entry — the at-scale training grad blow-up.
        alive=jnp.ones((T1, TILE_PIXELS), jnp.bool_),
        C=jnp.zeros((T1, TILE_PIXELS, 3), jnp.float32),
        D=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        med_d=jnp.full((T1, TILE_PIXELS), _MEDIAN_DEFAULT, jnp.float32),
        med_w=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        med_i=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        n_con=jnp.zeros((T1, TILE_PIXELS), jnp.int32),
    )

    def body(state, ci):
        base = ci * chunk
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, base, chunk)
        g = sl(gid)
        t = sl(tile)
        v = sl(valid)
        m2 = means2d[g]
        cn = conic[g]
        col = colors[g]
        dep = depths[g]
        op = opacities[g]

        alpha, _G, _dx, _dy = _chunk_alpha(m2, cn, op, v, t, grid_x)
        flags = _seg_flags(t)[:, None]
        segprod, _ = jax.lax.associative_scan(
            _seg_combine_prod, (1.0 - alpha, jnp.broadcast_to(flags, alpha.shape)),
            axis=0,
        )
        T_carry = state["T"][t]  # (C, 256)
        P_incl = T_carry * segprod
        P_excl = jnp.where(alpha > 0.0, P_incl / (1.0 - alpha), P_incl)
        applied = (P_incl >= _TERM_EPS) & state["alive"][t]
        w = jnp.where(applied, alpha * P_excl, 0.0)

        seg = lambda data: jax.ops.segment_sum(
            data, t, num_segments=T1, indices_are_sorted=True
        )
        state["C"] = state["C"] + seg(w[..., None] * col[:, None, :])
        state["D"] = state["D"] + seg(w * dep[:, None])

        T_min = jax.ops.segment_min(
            jnp.where(applied, P_incl, jnp.inf), t, num_segments=T1,
            indices_are_sorted=True,
        )
        state["T"] = jnp.minimum(state["T"], T_min)
        # once the raw cumulative product crosses eps anywhere in the
        # chunk's segment the pixel is done for good (P_incl is monotone
        # within a segment, so its segment-min is the end-of-chunk value)
        P_end = jax.ops.segment_min(
            P_incl, t, num_segments=T1, indices_are_sorted=True
        )
        state["alive"] = state["alive"] & (P_end >= _TERM_EPS)

        cross = applied & (alpha > 0.0) & (P_excl > 0.5) & (P_incl < 0.5)
        crossed = seg(cross.astype(jnp.float32)) > 0.0
        state["med_d"] = jnp.where(crossed, seg(jnp.where(cross, dep[:, None], 0.0)),
                                   state["med_d"])
        state["med_w"] = jnp.where(crossed, seg(jnp.where(cross, alpha * P_excl, 0.0)),
                                   state["med_w"])
        state["med_i"] = jnp.where(
            crossed, seg(jnp.where(cross, g[:, None].astype(jnp.float32), 0.0)),
            state["med_i"],
        )

        pos = base + jnp.arange(chunk, dtype=jnp.int32) - tile_start[jnp.minimum(t, num_tiles - 1)]
        contrib = (w > 0.0)
        n_new = jax.ops.segment_max(
            jnp.where(contrib, pos[:, None] + 1, 0), t, num_segments=T1,
            indices_are_sorted=True,
        )
        state["n_con"] = jnp.maximum(state["n_con"], n_new.astype(jnp.int32))
        return state, None

    state, _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))

    out = CompositeOut(
        color=state["C"], depth=state["D"], median_depth=state["med_d"],
        median_weight=state["med_w"], median_id=state["med_i"],
        final_T=state["T"], n_contrib=state["n_con"],
    )
    return out, state


def _composite_fwd(grid_x, grid_y, chunk, means2d, conic, colors, depths,
                   opacities, bg, gid, tile, valid, tile_start):
    out, _ = _composite_fwd_impl(
        grid_x, grid_y, chunk, means2d, conic, colors, depths, opacities,
        gid, tile, valid, tile_start,
    )
    res = (means2d, conic, colors, depths, opacities, bg, gid, tile, valid,
           tile_start, out.final_T, out.n_contrib)
    return out, res


def _composite_bwd(grid_x, grid_y, chunk, res, ct: CompositeOut):
    (means2d, conic, colors, depths, opacities, bg, gid, tile, valid,
     tile_start, final_T, n_contrib) = res
    num_tiles = grid_x * grid_y
    T1 = num_tiles + 1
    K = gid.shape[0]
    n_chunks = K // chunk
    N = means2d.shape[0]

    dC_img = ct.color  # (T1,256,3)
    dD_img = ct.depth
    dMed_img = ct.median_depth
    # final_opacity output is 1-T; callers differentiate the public
    # ``rendered_final_opacity`` which maps to dT = -d(1-T).  The public
    # wrapper passes ct.final_T as the cotangent of (1-T) pre-negated; here
    # ct.final_T is the raw cotangent w.r.t. final_T itself.
    dT_img = ct.final_T
    # dL/d(pixel final opacity) in CUDA terms: out_opacity = 1 - T
    dO_img = -dT_img

    bg_dot_dC = jnp.einsum("tpc,c->tp", dC_img, bg)  # (T1,256)

    # reversed views of the entry stream
    r_gid = gid[::-1]
    r_tile = tile[::-1]
    r_valid = valid[::-1]

    init = dict(
        T=final_T,  # transmittance after the last applied entry
        S=jnp.zeros((T1, TILE_PIXELS, 3), jnp.float32),  # suffix sum w*c
        SD=jnp.zeros((T1, TILE_PIXELS), jnp.float32),  # suffix sum w*d
        SO=jnp.zeros((T1, TILE_PIXELS), jnp.float32),  # suffix sum w
        d_means2d=jnp.zeros((N, 2), jnp.float32),
        d_conic=jnp.zeros((N, 3), jnp.float32),
        d_colors=jnp.zeros((N, 3), jnp.float32),
        d_depths=jnp.zeros((N,), jnp.float32),
        d_opac=jnp.zeros((N,), jnp.float32),
    )

    def body(state, ci):
        base = ci * chunk
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, base, chunk)
        g = sl(r_gid)
        t = sl(r_tile)
        v = sl(r_valid)
        m2 = means2d[g]
        cn = conic[g]
        col = colors[g]
        dep = depths[g]
        op = opacities[g]

        alpha, G, dx, dy = _chunk_alpha(m2, cn, op, v, t, grid_x)
        # entry position within its tile (reverse index -> forward index)
        fwd_idx = K - 1 - (base + jnp.arange(chunk, dtype=jnp.int32))
        pos = fwd_idx - tile_start[jnp.minimum(t, num_tiles - 1)]
        nc = state_nc = n_contrib_g = n_contrib[t]  # (C,256)
        contrib = (alpha > 0.0) & (pos[:, None] < nc)

        flags = jnp.broadcast_to(_seg_flags(t)[:, None], alpha.shape)
        inv_fac = jnp.where(contrib, 1.0 / (1.0 - alpha), 1.0)
        segprod, _ = jax.lax.associative_scan(
            _seg_combine_prod, (inv_fac, flags), axis=0
        )
        T_carry = state["T"][t]
        Tb = T_carry * segprod  # transmittance BEFORE each entry (test_T)
        w = jnp.where(contrib, alpha * Tb, 0.0)

        # within-chunk inclusive segmented suffix sums (in reverse order
        # "suffix" == scan forward over the reversed stream)
        def segsum_incl(x):
            if x.ndim == 2:
                f = flags
            else:
                f = jnp.broadcast_to(flags[..., None], x.shape)
            s, _ = jax.lax.associative_scan(_seg_combine_sum, (x, f), axis=0)
            return s

        wc = w[..., None] * col[:, None, :]
        wd = w * dep[:, None]
        S_excl = state["S"][t] + segsum_incl(wc) - wc
        SD_excl = state["SD"][t] + segsum_incl(wd) - wd
        SO_excl = state["SO"][t] + segsum_incl(w) - w

        dCg = dC_img[t]  # (C,256,3)
        dDg = dD_img[t]
        dOg = dO_img[t]
        dMedg = dMed_img[t]
        bgdot = bg_dot_dC[t]
        Tf = final_T[t]

        one_m_a = 1.0 - alpha
        dL_dalpha = (
            Tb * jnp.einsum("cpk,cpk->cp", jnp.broadcast_to(col[:, None, :], dCg.shape), dCg)
            - jnp.einsum("cpk,cpk->cp", S_excl, dCg) / one_m_a
            + Tb * dep[:, None] * dDg - SD_excl / one_m_a * dDg
            + Tb * dOg - SO_excl / one_m_a * dOg
            - Tf / one_m_a * bgdot
        )
        dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

        # median crossing in reconstruction space (backward.cu:566-569)
        T_after = Tb * one_m_a
        cross = contrib & (Tb > 0.5) & (T_after < 0.5)

        # per-gaussian accumulation (sum over the 256 pixels, scatter by id)
        d_col_e = jnp.einsum("cp,cpk->ck", w, dCg,
                             precision=jax.lax.Precision.HIGHEST)
        d_dep_e = jnp.sum(w * dDg + jnp.where(cross, dMedg, 0.0), axis=1)
        dL_dG = op[:, None] * dL_dalpha  # backward.cu:533 (no 0.99-clamp gate)
        # NOTE deviation from the reference: backward.cu:578-580 adds an extra
        # ``alpha*T * dL_dfinal_opacity`` term to the opacity gradient,
        # treating the constant-1 "opacity channel" like a color parameter.
        # That term is mathematically spurious (the correct final-opacity
        # gradient already flows through dL_dalpha's accum path); we omit it.
        d_op_e = jnp.sum(G * dL_dalpha, axis=1)
        dpow = G * dL_dG
        a_, b_, c_ = cn[:, 0:1], cn[:, 1:2], cn[:, 2:3]
        d_mx_e = jnp.sum(dpow * (-(a_ * dx + b_ * dy)), axis=1)
        d_my_e = jnp.sum(dpow * (-(c_ * dy + b_ * dx)), axis=1)
        d_ca_e = jnp.sum(dpow * (-0.5 * dx * dx), axis=1)
        d_cb_e = jnp.sum(dpow * (-dx * dy), axis=1)
        d_cc_e = jnp.sum(dpow * (-0.5 * dy * dy), axis=1)

        state["d_colors"] = state["d_colors"].at[g].add(d_col_e)
        state["d_depths"] = state["d_depths"].at[g].add(d_dep_e)
        state["d_opac"] = state["d_opac"].at[g].add(d_op_e)
        state["d_means2d"] = state["d_means2d"].at[g].add(
            jnp.stack([d_mx_e, d_my_e], -1)
        )
        state["d_conic"] = state["d_conic"].at[g].add(
            jnp.stack([d_ca_e, d_cb_e, d_cc_e], -1)
        )

        # carry updates: T after processing this (reverse) chunk == Tb of the
        # last reverse-processed applied entry; suffix sums grow by the
        # chunk's full segment totals.
        T_max = jax.ops.segment_max(
            jnp.where(contrib, Tb, -jnp.inf), t, num_segments=T1,
            indices_are_sorted=True,
        )
        state["T"] = jnp.where(jnp.isfinite(T_max), jnp.maximum(state["T"], T_max),
                               state["T"])
        seg = lambda data: jax.ops.segment_sum(
            data, t, num_segments=T1, indices_are_sorted=True
        )
        state["S"] = state["S"] + seg(wc)
        state["SD"] = state["SD"] + seg(wd)
        state["SO"] = state["SO"] + seg(w)
        return state, None

    state, _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))

    d_bg = jnp.zeros_like(bg)  # bg is not composited in the forward
    return (state["d_means2d"], state["d_conic"], state["d_colors"],
            state["d_depths"], state["d_opac"], d_bg,
            None, None, None, None)


composite.defvjp(_composite_fwd, _composite_bwd)


def tiles_to_image(tiled, grid_x: int, grid_y: int, H: int, W: int):
    """(T1, 256, ...) tile-major pixels -> (H, W, ...) image crop."""
    trailing = tiled.shape[2:]
    img = tiled[:-1].reshape((grid_y, grid_x, TILE_Y, TILE_X) + trailing)
    img = jnp.moveaxis(img, 2, 1).reshape((grid_y * TILE_Y, grid_x * TILE_X) + trailing)
    return img[:H, :W]
