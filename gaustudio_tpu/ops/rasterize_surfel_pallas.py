"""Pallas TPU fast path for 2DGS surfel rasterization (forward).

The surfel counterpart of binning_fast + rasterize_pallas: a 24-row entry
layout carries the ray-splat homography (M, 9), the view-depth
coefficients (Dk, 3), opacity, color, view-space normal and the gaussian
id through the same compact-sort -> monotone-expand -> tile-sort ->
256-aligned-realign pipeline, and a per-tile compositor kernel evaluates
the two-plane intersection alpha (reference semantics of
rasterize_surfel._surfel_alpha / composite_surfel) with entries on
sublanes and pixels on lanes.

Differentiable: rasterize_surfel.composite_surfel_fast wraps this forward
with a custom_vjp whose backward is the Pallas reverse walk in
rasterize_surfel_pallas_bwd — training (train_surfel) runs fwd+bwd fully
in Pallas on TPU; the XLA compositor remains the CPU/golden path.

Entry attribute rows: 0-8 M (Mx0..2, My0..2, Mw0..2), 9-11 Dk, 12 op,
13-15 rgb, 16-18 normal_view, 19 gid, 20 valid, 21 pre-tile-sort slot
(backward reduction), 22-23 mean2d (cx, cy — includes means2d_offset, used
by the 2D low-pass branch and the densification gradient).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops.binning_fast import (
    BLOCK,
    _blocked_cumsum,
    aligned_capacity,
    block_lo_from_starts,
    expand_table,
    fused_expand,
    realign_runs,
    tile_ranges,
)
from gaustudio_tpu.ops.gaussian import NEAR_CULL_Z, TILE_PIXELS, TILE_X, TILE_Y

S_ATTRS = 24  # entry rows (multiple of 8)
_TBL_ROWS = 32  # expand-table height: 28 used rows, sublane-padded
_FEXP_ROWS = 32  # fused-expand output rows: 25 used (22 attrs+valid+g+tile)
_TERM_EPS = 1e-4
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99
_FILTER_2D_VAR = 2.0
NUM_OUT = 16  # packed output rows per tile


class SurfelBinned(NamedTuple):
    aligned_blocks: jnp.ndarray  # [NB_AL, 24, BLOCK] 256-aligned tile runs
    flat_entries: jnp.ndarray  # [24, K] tile-sorted flat layout (backward)
    tile_count: jnp.ndarray  # [T] int32
    ablock_start: jnp.ndarray  # [T] int32
    tile_start: jnp.ndarray  # [T] int32 (flat layout)
    sorted_tile: jnp.ndarray  # [K] int32
    num_rendered: jnp.ndarray  # [] int32
    slot_gauss: jnp.ndarray  # [K] int32 slot -> compact gaussian (monotone)
    compact_gid: jnp.ndarray  # [N] int32 compact order -> original gaussian


def bin_surfels_fast(pre, grid_x: int, grid_y: int, num_entries: int,
                     carry_slot: bool = True) -> SurfelBinned:
    """Surfel twin of binning_fast.bin_gaussians_fast over SurfelPre.

    ``carry_slot=False`` (inference: mesh extraction, gs-render) drops the
    backward-only pre-sort slot operand from the tile sort and rides
    (r,g)/(b,opacity)/(n0,n1) as f16-packed pairs — 4 fewer operands of
    the ~25 total across the two stable sorts. f16 rounding (~2^-12
    relative) is invisible at 8-bit output; depth coefficients, mean2d
    and gid stay exact f32."""
    n = pre.depths.shape[0]
    K = num_entries
    num_tiles = grid_x * grid_y

    # 1. compact: sort gaussians by (invalid, depth). XLA variadic sort
    # codegen scales pathologically past ~16 operands (a 26-operand sort
    # COMPILES for over an hour on the remote Mosaic/XLA service), and
    # random gathers at entry scale run at seconds — so the 24 payload
    # columns ride through TWO stable sorts with identical keys (stable =>
    # identical permutations), each within the known-good operand budget.
    invalid = (~pre.valid).astype(jnp.int32)
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    m_cols = [pre.M[:, r, c] for r in range(3) for c in range(3)]
    attr_cols = m_cols + [
        pre.Dk[:, 0], pre.Dk[:, 1], pre.Dk[:, 2],
        pre.opacities,
        pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
        pre.normal_view[:, 0], pre.normal_view[:, 1], pre.normal_view[:, 2],
        jax.lax.stop_gradient(pre.mean2d[:, 0]),
        jax.lax.stop_gradient(pre.mean2d[:, 1]),
    ]  # 21 cols: M9 + Dk3 + op + rgb3 + n3 + mean2d
    tail_cols = (
        jnp.arange(n, dtype=jnp.float32),  # original gaussian id
        pre.tiles_touched.astype(jnp.int32),
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        rect_w.astype(jnp.float32),
    )
    keys = (invalid, pre.depths)
    s1 = jax.lax.sort(keys + tuple(attr_cols[:12]), num_keys=2, is_stable=True)
    s2 = jax.lax.sort(keys + tuple(attr_cols[12:]) + tail_cols, num_keys=2,
                      is_stable=True)
    # column indices: 0 invalid, 1 depth, 2-22 attrs (2-20 kernel attrs,
    # 21-22 mean2d), 23 gid, 24 tiles, 25 x0, 26 y0, 27 rw
    sorted_g = list(s1) + list(s2[2:])
    tiles_c = sorted_g[24]  # sorted tiles_touched (i32)

    # 2. slot geometry: exclusive entry-count cumsum + per-256-block window
    # anchors (Pallas boundary scan — no K-sized marker scatter; the full
    # slot->gaussian map is recovered inside the fused expand kernel)
    starts = _blocked_cumsum(tiles_c).astype(jnp.int32)
    total = starts[-1] + tiles_c[-1]
    block_lo = block_lo_from_starts(starts, K)

    # 3+4. fused expand: one Pallas pass selects per-slot attributes and
    # computes each entry's tile id (row-major rect walk); no exact-alpha
    # cull for surfels (the intersection support is not an ellipse in
    # pixel space). Table rows: 0-20 attrs (19-20 mean2d), 21 gid,
    # 22 valid, 23 starts, 24 x0, 25 y0, 26 rw, 27 iota.
    valid_s = (sorted_g[0] == 0).astype(jnp.float32)
    table = expand_table(
        [sorted_g[2 + i] for i in range(21)]  # attr rows 0-20 (+mean2d 19-20)
        + [
            sorted_g[23],  # 21: gid
            valid_s,  # 22: valid
            starts.astype(jnp.float32),  # 23
            sorted_g[25],  # 24: x0
            sorted_g[26],  # 25: y0
            sorted_g[27],  # 26: rw
            jnp.arange(n, dtype=jnp.float32),  # 27: iota
        ],
        height=_TBL_ROWS,
    )
    expanded_t = fused_expand(
        table, block_lo, total, grid_x, num_tiles, n, K,
        n_sel=22, starts_row=23, rect_rows=(24, 25, 26), valid_row=22,
        iota_row=27, out_rows=_FEXP_ROWS, cull=False,
    )
    # expanded_t rows: 0-18 kernel attrs, 19-20 mean2d, 21 gid, 22 valid,
    # 23 g (compact owner), 24 tile
    slot = jnp.arange(K, dtype=jnp.int32)
    g = expanded_t[23].astype(jnp.int32)
    tile = expanded_t[24].astype(jnp.int32)

    # 5. stable tile sort carrying the 22 attr+gid columns through TWO
    # <=14-operand stable sorts with identical keys (see the compact-sort
    # note: variadic sort codegen blows past ~16 operands, and row gathers
    # at entry scale run at seconds on XLA-TPU)
    t1 = jax.lax.sort(
        (tile,) + tuple(expanded_t[a] for a in range(10)),
        num_keys=1, is_stable=True,
    )
    if carry_slot:
        t2 = jax.lax.sort(
            (tile,) + tuple(expanded_t[a] for a in range(10, 22))
            + (slot.astype(jnp.float32),),
            num_keys=1, is_stable=True,
        )
    else:
        from gaustudio_tpu.ops.binning_fast import _pack2_f16, _unpack2_f16

        t2p = jax.lax.sort(
            (tile,)
            + (expanded_t[10], expanded_t[11])  # Dk1, Dk2 (exact)
            + (
                _pack2_f16(expanded_t[13], expanded_t[14]),  # (r, g)
                _pack2_f16(expanded_t[15], expanded_t[12]),  # (b, op)
                _pack2_f16(expanded_t[16], expanded_t[17]),  # (n0, n1)
            )
            + (expanded_t[18], expanded_t[19], expanded_t[20],
               expanded_t[21]),  # n2, cx, cy, gid (exact)
            num_keys=1, is_stable=True,
        )
        r_row, g_row = _unpack2_f16(t2p[3])
        b_row, op_row = _unpack2_f16(t2p[4])
        n0_row, n1_row = _unpack2_f16(t2p[5])
        zero_k = jnp.zeros((K,), jnp.float32)
        # rebuild the carry_slot operand order (slot row -> zeros)
        t2 = (t2p[0], t2p[1], t2p[2], op_row, r_row, g_row, b_row,
              n0_row, n1_row, t2p[6], t2p[7], t2p[8], t2p[9], zero_k)
    sort_tile = t1[0]
    valid_row = (sort_tile < num_tiles).astype(jnp.float32)
    # t2 payload order: cols 10-18 attrs -> t2[1:10]; col 19 cx -> t2[10];
    # col 20 cy -> t2[11]; col 21 gid -> t2[12]; slot -> t2[13]
    flat_entries = jnp.stack(
        list(t1[1:])             # rows 0-9: attrs
        + list(t2[1:10])         # rows 10-18: attrs
        + [t2[12]]               # row 19: gid
        + [valid_row]            # row 20: valid
        + [t2[13]]               # row 21: slot
        + [t2[10], t2[11]],      # rows 22-23: mean2d (cx, cy)
        axis=0,
    )  # [24, K]

    # Pallas boundary scan (binning_fast.tile_ranges): ~3ms vs ~6ms for
    # XLA searchsorted at 1080p entry counts
    pos = tile_ranges(sort_tile, num_tiles)
    tile_start = pos[:num_tiles]
    tile_count = pos[1:] - pos[:-1]

    # 6. realign to 256-aligned per-tile runs
    nb_al = aligned_capacity(K, num_tiles)
    abpt = (tile_count + BLOCK - 1) // BLOCK
    ablock_start = (jnp.cumsum(abpt) - abpt).astype(jnp.int32)
    bmark = jnp.zeros((nb_al,), jnp.int32).at[ablock_start].add(1, mode="drop")
    blk_tile = jnp.clip(jnp.cumsum(bmark) - 1, 0, num_tiles - 1)
    blk_k = jnp.arange(nb_al, dtype=jnp.int32) - ablock_start[blk_tile]
    src_lo = tile_start[blk_tile] + blk_k * BLOCK
    vcnt = jnp.clip(tile_count[blk_tile] - blk_k * BLOCK, 0, BLOCK)
    aligned_blocks = realign_runs(flat_entries, src_lo, vcnt, nb_al)

    return SurfelBinned(
        aligned_blocks=aligned_blocks,
        flat_entries=flat_entries,
        tile_count=tile_count,
        ablock_start=ablock_start,
        tile_start=tile_start,
        sorted_tile=sort_tile,
        num_rendered=total,
        slot_gauss=g.astype(jnp.int32),
        compact_gid=sorted_g[23].astype(jnp.int32),
    )


def _surfel_kernel(ablock_ref, count_ref, blocks_hbm, out_ref, scratch, sems,
                   *, grid_x: int, tiles_per_prog: int):
    gprog = pl.program_id(0)
    subl = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    qx = (q % TILE_X).astype(jnp.float32)
    qy = (q // TILE_X).astype(jnp.float32)

    def tile_meta(t):
        return ablock_ref[t], (count_ref[t] + BLOCK - 1) // BLOCK

    def start_first_dma(i, t):
        b0, nb = tile_meta(t)

        @pl.when(nb > 0)
        def _():
            pltpu.make_async_copy(
                blocks_hbm.at[b0], scratch.at[2 + i % 2], sems.at[2 + i % 2]
            ).start()

    start_first_dma(0, gprog * tiles_per_prog)

    def tile_body(i, _):
        t = gprog * tiles_per_prog + i
        b0, n_blocks = tile_meta(t)

        @pl.when(i + 1 < tiles_per_prog)
        def _():
            start_first_dma(i + 1, t + 1)

        tx = (t % grid_x).astype(jnp.float32)
        ty = (t // grid_x).astype(jnp.float32)
        px = tx * TILE_X + qx  # (1, 256)
        py = ty * TILE_Y + qy

        def get_dma(slot, blk_idx):
            return pltpu.make_async_copy(
                blocks_hbm.at[b0 + blk_idx], scratch.at[slot], sems.at[slot]
            )

        row = lambda v: jnp.full((1, TILE_PIXELS), v, jnp.float32)
        init = (
            jnp.zeros((), jnp.int32),
            row(1.0),  # T
            row(0.0), row(0.0), row(0.0),  # rgb
            row(0.0),  # D (== m1)
            row(0.0), row(0.0), row(0.0),  # normal
            row(0.0),  # med_d
            row(0.0),  # med_w
            row(0.0),  # med_i
            row(0.0),  # m2
            row(0.0),  # n_contrib
        )

        def cond(state):
            c, T = state[0], state[1]
            return (c < n_blocks) & (jnp.max(T) >= _TERM_EPS)

        def block_math(rows, c, slot, carry):
            # boundary fast path twin of rasterize_pallas._composite_kernel:
            # a tile's LAST block runs a (rows=128, 256) instance when its
            # valid count allows, halving the VPU work of half-empty blocks
            (T, r, gg, b, D, n0, n1, n2, md, mwt, mi, m2, nc) = carry
            sub = subl[:rows]
            blk = scratch[slot][:, :rows].T  # (24, rows) -> (rows, 24)

            mx = [blk[:, k:k + 1] for k in range(3)]  # Mx coefficients
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
            gid = blk[:, 19:20]
            vld = blk[:, 20:21]
            cx = blk[:, 22:23]
            cy = blk[:, 23:24]

            # two-plane ray-splat intersection (reference _surfel_alpha)
            hu = [px * mw[k] - mx[k] for k in range(3)]  # (BLOCK, 256) x3
            hv = [py * mw[k] - my[k] for k in range(3)]
            s0 = hu[1] * hv[2] - hu[2] * hv[1]
            s1 = hu[2] * hv[0] - hu[0] * hv[2]
            s2 = hu[0] * hv[1] - hu[1] * hv[0]
            sz = jnp.where(jnp.abs(s2) < 1e-9, 1e-9, s2)
            u = s0 / sz
            v = s1 / sz
            rho3d = u * u + v * v

            dx = cx - px
            dy = cy - py
            rho2d = (dx * dx + dy * dy) / _FILTER_2D_VAR

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

            # entry-axis inclusive prefix product of (1 - alpha)
            cum = 1.0 - alpha
            sft = 1
            while sft < rows:
                shifted = pltpu.roll(cum, sft, axis=0)
                shifted = jnp.where(sub < sft, 1.0, shifted)
                cum = cum * shifted
                sft *= 2

            P_incl = T * cum
            one_m = 1.0 - alpha
            P_excl = jnp.where(alpha > 0.0, P_incl / one_m, P_incl)
            applied = P_incl >= _TERM_EPS
            w = jnp.where(applied, alpha * P_excl, 0.0)

            r = r + jnp.sum(w * col_r, axis=0, keepdims=True)
            gg = gg + jnp.sum(w * col_g, axis=0, keepdims=True)
            b = b + jnp.sum(w * col_b, axis=0, keepdims=True)
            D = D + jnp.sum(w * depth, axis=0, keepdims=True)
            n0 = n0 + jnp.sum(w * nr0, axis=0, keepdims=True)
            n1 = n1 + jnp.sum(w * nr1, axis=0, keepdims=True)
            n2 = n2 + jnp.sum(w * nr2, axis=0, keepdims=True)
            m2 = m2 + jnp.sum(w * depth * depth, axis=0, keepdims=True)

            T = jnp.minimum(
                T, jnp.min(jnp.where(applied, P_incl, jnp.inf), axis=0,
                           keepdims=True)
            )

            cross = applied & (alpha > 0.0) & (P_excl > 0.5) & (P_incl < 0.5)
            crossed = jnp.any(cross, axis=0, keepdims=True)
            md = jnp.where(
                crossed, jnp.sum(jnp.where(cross, depth, 0.0), 0, keepdims=True), md
            )
            mwt = jnp.where(
                crossed,
                jnp.sum(jnp.where(cross, alpha * P_excl, 0.0), 0, keepdims=True),
                mwt,
            )
            mi = jnp.where(
                crossed, jnp.sum(jnp.where(cross, gid, 0.0), 0, keepdims=True), mi
            )

            pos1 = (c * BLOCK + sub + 1).astype(jnp.float32)
            nc = jnp.maximum(nc, jnp.max(jnp.where(w > 0.0, pos1, 0.0), 0,
                                         keepdims=True))
            return (T, r, gg, b, D, n0, n1, n2, md, mwt, mi, m2, nc)

        def body(state):
            c = state[0]
            carry = state[1:]
            slot = jnp.where(c == 0, 2 + i % 2, c % 2)

            @pl.when(c + 1 < n_blocks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()

            rem = count_ref[t] - c * BLOCK  # only the last block is partial
            carry = jax.lax.cond(
                rem <= BLOCK // 4,
                lambda a: block_math(BLOCK // 4, c, slot, a),
                lambda a: jax.lax.cond(
                    rem <= BLOCK // 2,
                    lambda b: block_math(BLOCK // 2, c, slot, b),
                    lambda b: block_math(BLOCK, c, slot, b),
                    a,
                ),
                carry,
            )
            return (c + 1,) + carry

        state = jax.lax.while_loop(cond, body, init)
        c_fin, T, r, gg, b, D, n0, n1, n2, md, mwt, mi, m2, nc = state

        @pl.when((c_fin > 0) & (c_fin < n_blocks))
        def _():
            get_dma(c_fin % 2, c_fin).wait()

        out_ref[i] = jnp.concatenate(
            [r, gg, b, D, n0, n1, n2, md, mwt, mi, T, m2, nc]
            + [jnp.zeros((NUM_OUT - 13, TILE_PIXELS), jnp.float32)],
            axis=0,
        )
        return 0

    jax.lax.fori_loop(0, tiles_per_prog, tile_body, 0)


def composite_surfel_pallas(binned: SurfelBinned, grid_x: int, grid_y: int,
                            tiles_per_prog: int = 8):
    """[T, 16, 256] packed surfel buffers: rows 0-2 rgb, 3 depth-sum (=m1),
    4-6 view normal, 7 med_d, 8 med_w, 9 med_i, 10 final_T, 11 m2,
    12 n_contrib."""
    num_tiles = grid_x * grid_y
    padded = -(-num_tiles // tiles_per_prog) * tiles_per_prog
    pad = padded - num_tiles
    ablock_start = jnp.pad(binned.ablock_start, (0, pad))
    tile_count = jnp.pad(binned.tile_count, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(padded // tiles_per_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tiles_per_prog, NUM_OUT, TILE_PIXELS), lambda t, s, c: (t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((4, S_ATTRS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = partial(_surfel_kernel, grid_x=grid_x,
                     tiles_per_prog=tiles_per_prog)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, NUM_OUT, TILE_PIXELS), jnp.float32),
        grid_spec=grid_spec,
        # self-contained tile-group programs: core-splittable on megacore
        # TPU gens (see rasterize_pallas.composite_pallas)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(ablock_start, tile_count, binned.aligned_blocks)
    return out[:num_tiles]
