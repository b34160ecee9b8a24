"""Pallas TPU backward compositor for 2DGS surfels — per-tile reverse walk.

Mirrors rasterize_pallas_bwd (vanilla) structure: per tile, entry blocks
walk back-to-front over the FLAT tile-sorted layout, transmittance is
reconstructed by division as a suffix product, and the "behind" terms
collapse into one suffix sum by pre-dotting the payload with the per-pixel
cotangents:

    payload = col.dC + depth.(dD + dm1) + depth^2.dm2 + nrm.dN + dA

(every surfel output is a sum of w * <per-entry quantity>, including the
accumulated alpha: sum w = 1 - T_final). The per-entry gradients then flow
through the two-plane ray-splat intersection:

    alpha = min(.99, op * exp(-rho/2)),  rho = min(rho3d, rho2d)
    (u, v) = (s0, s1)/s2,  s = (px*Mw - Mx) x (py*Mw - My)
    depth = Dk . (u, v, 1)

with the cross-product vjp da = b x dc, db = dc x a, branch-masked between
the 3D (intersection) and 2D (low-pass) support.

Per-entry gradient block rows (24): 0-2 dMx, 3-5 dMy, 6-8 dMw, 9-11 dDk,
12 dop, 13-15 drgb, 16-18 dnrm, 19 dcx, 20 dcy, 21-23 pad. Accumulation
uses the same RMW block scheme as the vanilla backward (boundary blocks
shared between adjacent tiles; sequential grid makes it race-free).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops.binning_fast import BLOCK
from gaustudio_tpu.ops.gaussian import NEAR_CULL_Z, TILE_PIXELS, TILE_X, TILE_Y
from gaustudio_tpu.ops.rasterize_pallas_bwd import (
    _suffix_incl_prod,
    _suffix_incl_sum,
    segment_reduce_compact,
)
from gaustudio_tpu.ops.rasterize_surfel_pallas import (
    S_ATTRS,
    SurfelBinned,
    _ALPHA_MAX,
    _ALPHA_MIN,
    _FILTER_2D_VAR,
    _TERM_EPS,
)

_CT = 12  # dCr dCg dCb dDsum dm2 dN0 dN1 dN2 dA dMed Tf nc
_GRAD_ROWS = 24


def _surfel_bwd_kernel(start_ref, count_ref, grads_in, ct_ref,
                       blocks_hbm, grads_out, scratch, gscr, sems, gsem_r,
                       gsem_w, *, grid_x: int, tiles_per_prog: int):
    g_prog = pl.program_id(0)
    subl = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    q_pix = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    qx = (q_pix % TILE_X).astype(jnp.float32)
    qy = (q_pix // TILE_X).astype(jnp.float32)

    # count clamps to the forward's max n_contrib: positions past it have
    # contrib=False on every pixel (factor 1, zero grads), so the reverse
    # walk skips whole trailing blocks exactly (see rasterize_pallas_bwd)
    def tile_meta(t, i):
        start = start_ref[t]
        nc_max = jnp.max(ct_ref[i, 11:12, :]).astype(jnp.int32)
        count = jnp.minimum(count_ref[t], nc_max)
        b0 = start // BLOCK
        return start, count, b0, (start + count + BLOCK - 1) // BLOCK - b0

    def start_last_dma(i, t):
        _, _, b0, nb = tile_meta(t, i)

        @pl.when(nb > 0)
        def _():
            pltpu.make_async_copy(
                blocks_hbm.at[:, pl.ds((b0 + nb - 1) * BLOCK, BLOCK)],
                scratch.at[2 + i % 2], sems.at[2 + i % 2],
            ).start()

    start_last_dma(0, g_prog * tiles_per_prog)

    def tile_body(i, _):
        t = g_prog * tiles_per_prog + i
        start, count, b0, n_blocks = tile_meta(t, i)

        @pl.when(i + 1 < tiles_per_prog)
        def _():
            start_last_dma(i + 1, t + 1)

        tx = (t % grid_x).astype(jnp.float32)
        ty = (t // grid_x).astype(jnp.float32)
        px = tx * TILE_X + qx
        py = ty * TILE_Y + qy

        ct = ct_ref[i]  # (12, 256)
        dCr = ct[0:1, :]
        dCg = ct[1:2, :]
        dCb = ct[2:3, :]
        dDs = ct[3:4, :]
        dM2 = ct[4:5, :]
        dN0 = ct[5:6, :]
        dN1 = ct[6:7, :]
        dN2 = ct[7:8, :]
        dA = ct[8:9, :]
        dMed = ct[9:10, :]
        Tf = ct[10:11, :]
        nc = ct[11:12, :]

        def get_dma(slot, blk_idx):
            return pltpu.make_async_copy(
                blocks_hbm.at[:, pl.ds((b0 + blk_idx) * BLOCK, BLOCK)],
                scratch.at[slot], sems.at[slot]
            )

        def grad_read(r):
            return pltpu.make_async_copy(
                grads_in.at[:, pl.ds((b0 + n_blocks - 1 - r) * BLOCK, BLOCK)],
                gscr.at[r % 2], gsem_r.at[r % 2],
            )

        def grad_write(r):
            return pltpu.make_async_copy(
                gscr.at[r % 2],
                grads_out.at[:, pl.ds((b0 + n_blocks - 1 - r) * BLOCK, BLOCK)],
                gsem_w.at[r % 2],
            )

        @pl.when(n_blocks > 0)
        def _():
            grad_read(0).start()

        init = (
            jnp.zeros((), jnp.int32),
            Tf + jnp.zeros((1, TILE_PIXELS), jnp.float32),  # T after stream
            jnp.zeros((1, TILE_PIXELS), jnp.float32),  # Sq suffix carry
        )

        def cond(state):
            return state[0] < n_blocks

        def block_math(rows, row_base, c, slot, Tc, Sq):
            """Backward-composite rows [row_base, row_base+rows) of block
            ``c``; a tile's partial FIRST/LAST flat blocks run narrower
            instances (valid entries confined to one half/quarter),
            matching the vanilla backward's boundary fast path."""
            sub = subl[:rows]
            blk = scratch[slot][:, row_base:row_base + rows].T  # (rows, 24)

            mx = [blk[:, k:k + 1] for k in range(3)]
            my = [blk[:, 3 + k:4 + k] for k in range(3)]
            mw = [blk[:, 6 + k:7 + k] for k in range(3)]
            dk0 = blk[:, 9:10]
            dk1 = blk[:, 10:11]
            dk2 = blk[:, 11:12]
            op = blk[:, 12:13]
            col_r = blk[:, 13:14]
            col_g = blk[:, 14:15]
            col_b = blk[:, 15:16]
            nr0 = blk[:, 16:17]
            nr1 = blk[:, 17:18]
            nr2 = blk[:, 18:19]
            vld = blk[:, 20:21]
            cx = blk[:, 22:23]
            cy = blk[:, 23:24]

            # recompute the forward intersection (same op order as the
            # fwd kernel's UNPACKED branch — the adjugate affine form is
            # ill-conditioned at global pixel coordinates, see the fwd
            # kernel note)
            hu = [px * mw[k] - mx[k] for k in range(3)]
            hv = [py * mw[k] - my[k] for k in range(3)]
            s0 = hu[1] * hv[2] - hu[2] * hv[1]
            s1 = hu[2] * hv[0] - hu[0] * hv[2]
            s2 = hu[0] * hv[1] - hu[1] * hv[0]
            guarded = jnp.abs(s2) < 1e-9
            sz = jnp.where(guarded, 1e-9, s2)
            u = s0 / sz
            v = s1 / sz
            rho3d = u * u + v * v
            ddx2 = cx - px
            ddy2 = cy - py
            rho2d = (ddx2 * ddx2 + ddy2 * ddy2) / _FILTER_2D_VAR
            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            G = jnp.exp(-0.5 * rho)
            alpha = jnp.minimum(_ALPHA_MAX, op * G)
            # 2D-branch depth = center depth (reference 2DGS semantics)
            depth = jnp.where(use3d, dk0 * u + dk1 * v + dk2, dk2)
            alpha = jnp.where(
                (depth <= NEAR_CULL_Z) | (alpha < _ALPHA_MIN) | (vld < 0.5),
                0.0,
                alpha,
            )
            pos = (b0 + c) * BLOCK + row_base + sub - start
            in_range = (pos >= 0) & (pos < count)
            alpha = jnp.where(in_range, alpha, 0.0)
            contrib = (alpha > 0.0) & (pos < nc.astype(jnp.int32))

            one_m = 1.0 - alpha
            factor = jnp.where(contrib, one_m, 1.0)
            revincl = _suffix_incl_prod(factor, sub, rows)
            Tb = Tc / revincl
            w = jnp.where(contrib, alpha * Tb, 0.0)

            payload = (
                col_r * dCr + col_g * dCg + col_b * dCb
                + depth * dDs + depth * depth * dM2
                + nr0 * dN0 + nr1 * dN1 + nr2 * dN2
                + dA
            )
            q = w * payload
            Sq_e = Sq + _suffix_incl_sum(q, sub, rows) - q

            dL_dalpha = Tb * payload - Sq_e / one_m
            dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

            T_after = Tb * one_m
            cross = contrib & (Tb > 0.5) & (T_after < 0.5)

            # alpha -> (G, op); rho = min branch
            dG_t = op * dL_dalpha
            drho = -0.5 * G * dG_t  # (BLOCK, 256)
            d_op = jnp.sum(G * dL_dalpha, axis=1, keepdims=True)

            # depth cotangent; flows through (u, v) only on the 3D branch
            ddep = w * dDs + 2.0 * depth * w * dM2 + jnp.where(cross, dMed, 0.0)
            ddep3 = jnp.where(use3d, ddep, 0.0)

            # 3D branch: rho3d = u^2 + v^2
            du = jnp.where(use3d, 2.0 * u * drho, 0.0) + dk0 * ddep3
            dv = jnp.where(use3d, 2.0 * v * drho, 0.0) + dk1 * ddep3

            d_dk0 = jnp.sum(u * ddep3, axis=1, keepdims=True)
            d_dk1 = jnp.sum(v * ddep3, axis=1, keepdims=True)
            d_dk2 = jnp.sum(ddep, axis=1, keepdims=True)

            ds0 = du / sz
            ds1 = dv / sz
            dsz = -(u * du + v * dv) / sz
            ds2 = jnp.where(guarded, 0.0, dsz)

            # cross-product vjp: s = hu x hv -> dhu = hv x ds, dhv = ds x hu
            dhu0 = hv[1] * ds2 - hv[2] * ds1
            dhu1 = hv[2] * ds0 - hv[0] * ds2
            dhu2 = hv[0] * ds1 - hv[1] * ds0
            dhv0 = ds1 * hu[2] - ds2 * hu[1]
            dhv1 = ds2 * hu[0] - ds0 * hu[2]
            dhv2 = ds0 * hu[1] - ds1 * hu[0]
            dhu = [dhu0, dhu1, dhu2]
            dhv = [dhv0, dhv1, dhv2]

            # hu_k = px*Mw_k - Mx_k ; hv_k = py*Mw_k - My_k
            d_mx = [-jnp.sum(dhu[k], axis=1, keepdims=True) for k in range(3)]
            d_my = [-jnp.sum(dhv[k], axis=1, keepdims=True) for k in range(3)]
            d_mw = [
                jnp.sum(px * dhu[k] + py * dhv[k], axis=1, keepdims=True)
                for k in range(3)
            ]

            # 2D branch: rho2d = (dx^2 + dy^2)/VAR
            drho2 = jnp.where(use3d, 0.0, drho)
            d_cx = jnp.sum(drho2 * 2.0 * ddx2 / _FILTER_2D_VAR, axis=1,
                           keepdims=True)
            d_cy = jnp.sum(drho2 * 2.0 * ddy2 / _FILTER_2D_VAR, axis=1,
                           keepdims=True)

            d_r = jnp.sum(w * dCr, axis=1, keepdims=True)
            d_g = jnp.sum(w * dCg, axis=1, keepdims=True)
            d_b = jnp.sum(w * dCb, axis=1, keepdims=True)
            d_n0 = jnp.sum(w * dN0, axis=1, keepdims=True)
            d_n1 = jnp.sum(w * dN1, axis=1, keepdims=True)
            d_n2 = jnp.sum(w * dN2, axis=1, keepdims=True)

            upd = jnp.concatenate(
                d_mx + d_my + d_mw
                + [d_dk0, d_dk1, d_dk2, d_op, d_r, d_g, d_b, d_n0, d_n1,
                   d_n2, d_cx, d_cy]
                + [jnp.zeros((rows, _GRAD_ROWS - 21), jnp.float32)],
                axis=1,
            ).T  # (rows, 24) -> (24, rows)
            # pad to a full-width (24, BLOCK) update so the RMW add below is
            # branch-independent (out-of-slice lanes add zero)
            pads = []
            if row_base > 0:
                pads.append(jnp.zeros((_GRAD_ROWS, row_base), jnp.float32))
            pads.append(upd)
            if row_base + rows < BLOCK:
                pads.append(jnp.zeros((_GRAD_ROWS, BLOCK - row_base - rows),
                                      jnp.float32))
            upd_full = jnp.concatenate(pads, axis=1) if len(pads) > 1 else upd
            return Tb[0:1, :], Sq + jnp.sum(q, axis=0, keepdims=True), upd_full

        def body(state):
            r, Tc, Sq = state
            c = n_blocks - 1 - r
            slot = jnp.where(r == 0, 2 + i % 2, r % 2)

            @pl.when(r + 1 < n_blocks)
            def _():
                get_dma((r + 1) % 2, c - 1).start()

            get_dma(slot, c).wait()

            # a tile's partial first/last flat blocks: valid rows confined
            # to one half (quarter) run a (128, 256) ((64, 256)) instance
            start_off = start - b0 * BLOCK
            end_off = start + count - (b0 + n_blocks - 1) * BLOCK
            half = BLOCK // 2
            quart = BLOCK // 4
            is_last = c == n_blocks - 1
            is_first = c == 0
            use_lower_q = is_last & (end_off <= quart)
            use_lower = is_last & (end_off <= half)
            use_upper_q = is_first & (start_off >= BLOCK - quart)
            use_upper = is_first & (start_off >= half)
            Tc, Sq, upd = jax.lax.cond(
                use_lower,
                lambda a: jax.lax.cond(
                    use_lower_q,
                    lambda b: block_math(quart, 0, c, slot, *b),
                    lambda b: block_math(half, 0, c, slot, *b),
                    a,
                ),
                lambda a: jax.lax.cond(
                    use_upper,
                    lambda b: jax.lax.cond(
                        use_upper_q,
                        lambda d: block_math(quart, BLOCK - quart, c, slot, *d),
                        lambda d: block_math(half, half, c, slot, *d),
                        b,
                    ),
                    lambda b: block_math(BLOCK, 0, c, slot, *b),
                    a,
                ),
                (Tc, Sq),
            )

            grad_read(r).wait()
            gscr[r % 2] = gscr[r % 2] + upd
            grad_write(r).start()

            @pl.when(r + 1 < n_blocks)
            def _():
                @pl.when(r >= 1)
                def _():
                    grad_write(r - 1).wait()

                grad_read(r + 1).start()

            return (r + 1, Tc, Sq)

        jax.lax.while_loop(cond, body, init)

        @pl.when(n_blocks >= 2)
        def _():
            grad_write(n_blocks - 2).wait()

        @pl.when(n_blocks >= 1)
        def _():
            grad_write(n_blocks - 1).wait()

        return 0

    jax.lax.fori_loop(0, tiles_per_prog, tile_body, 0)


def composite_surfel_backward_pallas(binned: SurfelBinned, ct_tiles,
                                     grid_x: int, grid_y: int,
                                     tiles_per_prog: int = 8):
    """Per-entry surfel gradients [24, K] flat (rows per module docstring),
    in the same tile-sorted order as ``binned.flat_entries``.

    ct_tiles: [T, 12, 256] packed per-tile cotangents + forward state
    (rows dCr dCg dCb dDsum dm2 dN0 dN1 dN2 dA dMed final_T n_contrib).
    """
    num_tiles = grid_x * grid_y
    K = binned.flat_entries.shape[1]
    padded = -(-num_tiles // tiles_per_prog) * tiles_per_prog
    pad = padded - num_tiles
    tile_start = jnp.pad(binned.tile_start, (0, pad))
    tile_count = jnp.pad(binned.tile_count, (0, pad))
    ct_tiles = jnp.pad(ct_tiles, ((0, pad), (0, 0), (0, 0)))

    grads_zero = jnp.zeros((_GRAD_ROWS, K), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(padded // tiles_per_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tiles_per_prog, _CT, TILE_PIXELS),
                         lambda t, s, c: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, S_ATTRS, BLOCK), jnp.float32),
            pltpu.VMEM((2, _GRAD_ROWS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_surfel_bwd_kernel, grid_x=grid_x,
                     tiles_per_prog=tiles_per_prog)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_GRAD_ROWS, K), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tile_start, tile_count, grads_zero, ct_tiles, binned.flat_entries)


def reduce_surfel_entry_grads(grads_flat, binned: SurfelBinned,
                              num_gaussians: int):
    """[24, K] per-entry gradients -> per-Gaussian gradient dict (original
    order): dM [N,3,3], dDk [N,3], dop [N], dcol [N,3], dnrm [N,3],
    dmean2d [N,2]."""
    slot_key = binned.flat_entries[21].astype(jnp.int32)

    # two <=12-payload stable sorts with identical keys (sort-operand rule)
    r1 = jax.lax.sort(
        (slot_key,) + tuple(grads_flat[a] for a in range(11)),
        num_keys=1, is_stable=True,
    )
    r2 = jax.lax.sort(
        (slot_key,) + tuple(grads_flat[a] for a in range(11, 21)),
        num_keys=1, is_stable=True,
    )
    table = jnp.concatenate(
        [
            jnp.stack(list(r1[1:]) + list(r2[1:]), axis=0),
            jnp.zeros((_GRAD_ROWS - 21, slot_key.shape[0]), jnp.float32),
        ],
        axis=0,
    )  # [24, K] slot-ordered
    sums_c = segment_reduce_compact(
        table, binned.slot_gauss, binned.slot_gauss[::BLOCK], num_gaussians
    )  # [N, 24] compact order
    sums = jnp.zeros((num_gaussians, _GRAD_ROWS), jnp.float32).at[
        binned.compact_gid
    ].set(sums_c, mode="drop", unique_indices=True)

    dM = jnp.stack(
        [sums[:, 0:3], sums[:, 3:6], sums[:, 6:9]], axis=1
    )  # [N, 3, 3] rows (Mx, My, Mw)
    dDk = sums[:, 9:12]
    dop = sums[:, 12]
    dcol = sums[:, 13:16]
    dnrm = sums[:, 16:19]
    dmean2d = sums[:, 19:21]
    return dM, dDk, dop, dcol, dnrm, dmean2d
