"""Pallas TPU fast path for 2DGS surfel rasterization (forward).

The surfel counterpart of binning_fast + rasterize_pallas: a 24-row entry
layout carries the ray-splat homography (M, 9), the view-depth
coefficients (Dk, 3), opacity, color, view-space normal and the gaussian
id through the same fused-expand -> 2-key (tile, depth) sort pipeline
(train: 256-aligned realign for the backward; inference: the compositor
reads flat runs directly with an in-kernel roll), and a per-tile
compositor kernel evaluates the two-plane intersection alpha (reference
semantics of rasterize_surfel._surfel_alpha / composite_surfel) with
entries on sublanes and pixels on lanes.

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
    PACK_ALIGN,
    _blocked_cumsum,
    aligned_capacity,
    block_lo_from_starts,
    expand_table,
    fused_expand,
    realign_runs,
    tile_ranges,
)
from gaustudio_tpu.ops.gaussian import NEAR_CULL_Z, TILE_PIXELS, TILE_X, TILE_Y
from gaustudio_tpu.ops.rasterize_pallas import (
    _SB_SL,
    _SUBBLK,
    _RGB10_INV,
    _half_hi,
    _half_lo,
)

# r4 packed single-sort inference path (surfel twin of binning_fast's
# PACK_RGB10/PACK_KEY1 flat table): the homography M is made TILE-RELATIVE
# (Mx' = Mx - 16*tx*Mw, My' = My - 16*ty*Mw, so hu = qx*Mw - Mx' with the
# LOCAL qx in [0,16)) and PER-ENTRY NORMALIZED (u = s0/s2, v = s1/s2 are
# invariant to a global scale of M, so dividing all 9 coefficients by
# max|M'| puts them in [-1, 1] where f16's 2^-11 relative error costs
# ~1.5e-3 in (u, v) — inside the inference parity gate). Entries then ride
# ONE 10-12-operand sort (fused (tile|depth) uint32 key + packed payload
# rows) instead of two 12-operand stable sorts, and the compositor windows
# DMA a [16, K] int32 table instead of [24, K] f32.
SURFEL_PACK = __import__("os").environ.get("GS_SURFEL_PACK", "1") == "1"
# Measured DEAD END (on-chip A/B 2026-08-20, 1080p/200k/1.41M entries):
# the affine-adjugate cross product (9 per-entry minors + 6 per-pixel
# FMAs) LOSES to the direct hu/hv form (21 per-pixel ops): 38.18 vs
# 47.84 MPix/s inference. A (rows, 1) column op still occupies a full
# 8x128 VPU register on TPU, so the "per-entry" minors cost ~half a
# (rows, 256) op EACH — 18 half-ops + 6 full beats 21 full only on
# paper; in practice the extra live registers also spill. Default OFF.
SURFEL_ADJ = __import__("os").environ.get("GS_SURFEL_ADJ", "0") == "1"
# Pack the unit world normal as 10-bit fixed-point channels in one int32
# (the rgb10 scheme): drops one sort operand (~1 ms at 1.4M entries).
# Quantization 2^-9 on a unit vector — bounded 1e-3 normal error, far
# inside the mesh-extraction normal-fusion tolerance.
SURFEL_NPACK = __import__("os").environ.get("GS_SURFEL_NPACK", "1") == "1"
# Dk0/Dk1 depth slopes ride as f16 of v/16: f16's relative precision
# (2^-11) is scale-free, so dividing by 16 extends the representable range
# to +-960000 (covering grazing, near-edge-on surfels whose slopes
# overflowed the old direct-f16 clamp and rendered a flattened depth
# plane) at no precision cost; slopes below ~1e-3 flush to zero through
# the f16 subnormal range (depth error <= 3e-3 across a 3-sigma extent).
_PK_DK_SCALE = 16.0
_PK_CLAMP = 60000.0 * _PK_DK_SCALE  # post-scale f16-overflow guard

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
                     carry_slot: bool = True,
                     realign: bool = True,
                     carry_gid: bool = True) -> SurfelBinned:
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

    # 1. slot allocation IN PREPROCESS ORDER (r3: the old 2x13-operand
    # compact-by-depth sort pair bought only single-key stability of the
    # tile sort; depth now rides as the tile sort's second key instead).
    # Every gaussian owns >= 1 slot (zero-tile ones get a single valid=0
    # slot) so the fused-expand window invariant holds.
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    tiles_t = pre.tiles_touched.astype(jnp.int32)
    valid_g = pre.valid & (tiles_t > 0)
    tiles_alloc = jnp.maximum(tiles_t, 1)
    iota_f = jnp.arange(n, dtype=jnp.float32)

    # 2. slot geometry: exclusive slot-count cumsum + per-256-block window
    # anchors (Pallas boundary scan — no K-sized marker scatter; the full
    # slot->gaussian map is recovered inside the fused expand kernel)
    starts = _blocked_cumsum(tiles_alloc).astype(jnp.int32)
    total = starts[-1] + tiles_alloc[-1]
    block_lo = block_lo_from_starts(starts, K)

    # 3+4. fused expand: one Pallas pass selects per-slot attributes and
    # computes each entry's tile id (row-major rect walk); no exact-alpha
    # cull for surfels (the intersection support is not an ellipse in
    # pixel space). Table rows: 0-20 attrs (19-20 mean2d), 21 depth,
    # 22 gid, 23 valid, 24 starts, 25 x0, 26 y0, 27 rw, 28 iota.
    table = expand_table(
        [pre.M[:, r, c] for r in range(3) for c in range(3)]
        + [
            pre.Dk[:, 0], pre.Dk[:, 1], pre.Dk[:, 2],
            pre.opacities,
            pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
            pre.normal_view[:, 0], pre.normal_view[:, 1],
            pre.normal_view[:, 2],
            jax.lax.stop_gradient(pre.mean2d[:, 0]),
            jax.lax.stop_gradient(pre.mean2d[:, 1]),
            pre.depths,  # 21: tile-sort second key
            iota_f,  # 22: gid
            valid_g.astype(jnp.float32),  # 23: valid
            starts.astype(jnp.float32),  # 24
            pre.rect_min[:, 0].astype(jnp.float32),  # 25: x0
            pre.rect_min[:, 1].astype(jnp.float32),  # 26: y0
            rect_w.astype(jnp.float32),  # 27: rw
            iota_f,  # 28: iota
        ],
        height=_TBL_ROWS,
    )
    expanded_t = fused_expand(
        table, block_lo, total, grid_x, num_tiles, n, K,
        n_sel=23, starts_row=24, rect_rows=(25, 26, 27), valid_row=23,
        iota_row=28, out_rows=_FEXP_ROWS, cull=False,
    )
    # expanded_t rows: 0-18 kernel attrs, 19-20 mean2d, 21 depth, 22 gid,
    # 23 valid, 24 g (compact owner), 25 tile
    slot = jnp.arange(K, dtype=jnp.int32)
    g = expanded_t[24].astype(jnp.int32)
    tile = expanded_t[25].astype(jnp.int32)
    dep = expanded_t[21]

    # 5. 2-key (tile, depth) sort carrying the 22 attr+gid columns through
    # TWO sorts with identical keys (XLA variadic sort codegen blows past
    # ~16 operands, and row gathers at entry scale run at seconds on
    # XLA-TPU). is_stable=True is LOAD-BEARING here: it makes the
    # permutation a deterministic function of the key sequence, so both
    # sorts apply the identical permutation even on (tile, depth) ties.
    if carry_slot or not (SURFEL_PACK and num_tiles < (1 << 13)):
        t1 = jax.lax.sort(
            (tile, dep) + tuple(expanded_t[a] for a in range(10)),
            num_keys=2, is_stable=True,
        )
    if carry_slot:
        # training: gid feeds only the median-id output, which the loss
        # never reads — carry_gid=False drops that operand
        gid_ops = (expanded_t[22],) if carry_gid else ()
        t2 = jax.lax.sort(
            (tile, dep) + tuple(expanded_t[a] for a in range(10, 21))
            + gid_ops + (slot.astype(jnp.float32),),
            num_keys=2, is_stable=True,
        )
        t2 = t2[:1] + t2[2:]  # drop the depth key: payload at t2[1:]
        if not carry_gid:
            # restore the (.., gid, slot) tail shape with a zero gid row
            t2 = t2[:12] + (jnp.zeros((K,), jnp.float32), t2[12])
    elif SURFEL_PACK and num_tiles < (1 << 13):
        # PACKED SINGLE-SORT flat table (see module-top SURFEL_PACK note).
        # Row layout ([16, K] int32, remaining rows zero pad):
        #   0: (Mx'0, My'0)  1: (Mx'1, My'1)  2: (Mx'2, My'2)  f16 pairs,
        #   3: (Mw0, Mw1)    4: (Mw2, opacity)                 normalized
        #   5: (Dk0, Dk1) f16 pair of v/16   6: Dk2 f32 bits (center depth)
        #   7: rgb10 (10-bit fixed-point channels in [0, 4])
        #   NPACK:  8: packed 10-bit normal  9: gid f32 bits
        #   else:   8: (n0, n1) f16  9: (n2, 0) f16  10: gid f32 bits
        # (the 2D-filter center is NOT a row: cx = Mx'2/Mw2, cy = My'2/Mw2
        # in-kernel)
        from gaustudio_tpu.ops.binning_fast import (
            _DEPTH_Q_SHIFT,
            _RGB10_SCALE,
            _pack2_f16,
        )

        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        tile_c = jnp.minimum(tile, num_tiles - 1).astype(jnp.float32)
        tyf = jnp.floor(tile_c / jnp.float32(grid_x))
        txf = tile_c - tyf * grid_x
        mx = [expanded_t[k] for k in range(3)]
        my = [expanded_t[3 + k] for k in range(3)]
        mw = [expanded_t[6 + k] for k in range(3)]
        mxp = [mx[k] - 16.0 * txf * mw[k] for k in range(3)]
        myp = [my[k] - 16.0 * tyf * mw[k] for k in range(3)]
        mabs = jnp.zeros_like(dep)
        for vset in (mxp, myp, mw):
            for v in vset:
                mabs = jnp.maximum(mabs, jnp.abs(v))
        msc = 1.0 / jnp.maximum(mabs, 1e-12)
        q10 = lambda v: jnp.round(
            jnp.clip(v, 0.0, 4.0) * _RGB10_SCALE).astype(jnp.int32)
        rgb10 = (q10(expanded_t[13]) | (q10(expanded_t[14]) << 10)
                 | (q10(expanded_t[15]) << 20))
        dkc = lambda v: jnp.clip(v, -_PK_CLAMP, _PK_CLAMP)
        # Dk2 == the center depth == the sort key's depth (preprocess
        # builds Dk = [tu_z, tv_z, depths]), so it does NOT ride the sort:
        # it is reconstructed mid-quantum from the sorted key below
        # (2^-12 relative, same scheme as binning_fast PACK_KEY1). gid
        # feeds only the median-id output — an OPTIONAL extension of the
        # reference surfel allmap (surfel_renderer.py:112-117 reads it
        # only when len(allmap) > 7) — and is dropped when the caller
        # does not ask for it. 11 sort operands (or 12 with gid), down
        # from 13.
        cols = (
            _pack2_f16(mxp[0] * msc, myp[0] * msc),
            _pack2_f16(mxp[1] * msc, myp[1] * msc),
            _pack2_f16(mxp[2] * msc, myp[2] * msc),
            _pack2_f16(mw[0] * msc, mw[1] * msc),
            _pack2_f16(mw[2] * msc, expanded_t[12]),
            _pack2_f16(dkc(expanded_t[9]) / _PK_DK_SCALE,
                       dkc(expanded_t[10]) / _PK_DK_SCALE),
            rgb10,
        )
        # the 2D-filter center does NOT ride the sort: cx = Mx2/Mw2,
        # cy = My2/Mw2 (the image of (0,0,1) under the packed tile-relative
        # homography) is reconstructed in-kernel from columns already
        # carried — one fewer sort operand (~1 ms at headline K)
        if SURFEL_NPACK:
            qn = lambda v: (jnp.round(jnp.clip(v, -1.0, 1.0) * 511.0)
                            .astype(jnp.int32) + 512)
            npack = (qn(expanded_t[16]) | (qn(expanded_t[17]) << 10)
                     | (qn(expanded_t[18]) << 20))
            cols = cols + (npack,)
        else:
            cols = cols + (
                _pack2_f16(expanded_t[16], expanded_t[17]),
                _pack2_f16(expanded_t[18], jnp.zeros_like(dep)),
            )
        if carry_gid:
            cols = cols + (bc(expanded_t[22]),)
        # fused (tile | depth) uint32 key, as binning_fast PACK_KEY1: the
        # top 19 bits of the positive-f32 depth pattern are monotone in
        # depth; culled rows carry tile == num_tiles and sort to the tail
        dbits = jax.lax.bitcast_convert_type(dep, jnp.uint32)
        key = (tile.astype(jnp.uint32) << 19) | (
            (dbits >> _DEPTH_Q_SHIFT) & jnp.uint32(0x7FFFF))
        sorted_ops = jax.lax.sort((key,) + cols, num_keys=1,
                                  is_stable=False)
        sort_tile = (sorted_ops[0] >> 19).astype(jnp.int32)
        zero_i = jnp.zeros((K,), jnp.int32)
        # mid-quantum Dk2 reconstruction from the sorted key (2^-12 rel)
        dep_rec = jax.lax.bitcast_convert_type(
            ((sorted_ops[0] & jnp.uint32(0x7FFFF)) << _DEPTH_Q_SHIFT)
            | jnp.uint32(1 << (_DEPTH_Q_SHIFT - 1)),
            jnp.float32,
        )
        # payload count WITHOUT the optional gid tail operand
        n_pay = len(cols) - (1 if carry_gid else 0)  # 9 (npack) or 10
        gid_row = sorted_ops[1 + n_pay] if carry_gid else zero_i
        flat_entries = jnp.stack(
            list(sorted_ops[1:7]) + [bc(dep_rec)]
            + list(sorted_ops[7:1 + n_pay]) + [gid_row]
            + [zero_i] * (16 - 2 - n_pay),
            axis=0)  # [16, K] int32; rows 0-5 M/dk01, 6 Dk2, then
        # rgb10 + (npack, cxy | n01, n2, cxy) + gid, zero-padded to 16
        pos = tile_ranges(sort_tile, num_tiles)
        tile_start = pos[:num_tiles]
        tile_count = pos[1:] - pos[:-1]
        if PACK_ALIGN:
            # GS_PACK_ALIGN (see binning_fast): 256-align the packed runs
            # so the compositor skips the per-block window roll; zeroed
            # padding rows decode to opacity 0
            nb_al = aligned_capacity(K, num_tiles)
            abpt = (tile_count + BLOCK - 1) // BLOCK
            ablock_start = (jnp.cumsum(abpt) - abpt).astype(jnp.int32)
            bmark = jnp.zeros((nb_al,), jnp.int32).at[ablock_start].add(
                1, mode="drop"
            )
            blk_tile = jnp.clip(jnp.cumsum(bmark) - 1, 0, num_tiles - 1)
            blk_k = jnp.arange(nb_al, dtype=jnp.int32) - ablock_start[blk_tile]
            src_lo = tile_start[blk_tile] + blk_k * BLOCK
            vcnt = jnp.clip(tile_count[blk_tile] - blk_k * BLOCK, 0, BLOCK)
            aligned_blocks = realign_runs(flat_entries, src_lo, vcnt, nb_al)
        else:
            ablock_start = jnp.zeros((num_tiles,), jnp.int32)
            aligned_blocks = jnp.zeros((0, S_ATTRS, BLOCK), jnp.float32)
        return SurfelBinned(
            aligned_blocks=aligned_blocks,
            flat_entries=flat_entries,
            tile_count=tile_count,
            ablock_start=ablock_start,
            tile_start=tile_start,
            sorted_tile=sort_tile,
            num_rendered=total,
            slot_gauss=g.astype(jnp.int32),
            compact_gid=jnp.arange(n, dtype=jnp.int32),
        )
    else:
        from gaustudio_tpu.ops.binning_fast import _pack2_f16, _unpack2_f16

        t2p = jax.lax.sort(
            (tile, dep)
            + (expanded_t[10], expanded_t[11])  # Dk1, Dk2 (exact)
            + (
                _pack2_f16(expanded_t[13], expanded_t[14]),  # (r, g)
                _pack2_f16(expanded_t[15], expanded_t[12]),  # (b, op)
                _pack2_f16(expanded_t[16], expanded_t[17]),  # (n0, n1)
            )
            + (expanded_t[18], expanded_t[19], expanded_t[20],
               expanded_t[22]),  # n2, cx, cy, gid (exact)
            num_keys=2, is_stable=True,
        )
        r_row, g_row = _unpack2_f16(t2p[4])
        b_row, op_row = _unpack2_f16(t2p[5])
        n0_row, n1_row = _unpack2_f16(t2p[6])
        zero_k = jnp.zeros((K,), jnp.float32)
        # rebuild the carry_slot operand order (slot row -> zeros)
        t2 = (t2p[0], t2p[2], t2p[3], op_row, r_row, g_row, b_row,
              n0_row, n1_row, t2p[7], t2p[8], t2p[9], t2p[10], zero_k)
    sort_tile = t1[0]
    valid_row = (sort_tile < num_tiles).astype(jnp.float32)
    # t2 payload order: cols 10-18 attrs -> t2[1:10]; col 19 cx -> t2[10];
    # col 20 cy -> t2[11]; col 22 gid -> t2[12]; slot -> t2[13]
    flat_entries = jnp.stack(
        list(t1[2:])             # rows 0-9: attrs
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

    # 6. realign to 256-aligned per-tile runs (skipped on inference: the
    # flat-mode compositor rolls runs into place in-kernel)
    if realign:
        nb_al = aligned_capacity(K, num_tiles)
        abpt = (tile_count + BLOCK - 1) // BLOCK
        ablock_start = (jnp.cumsum(abpt) - abpt).astype(jnp.int32)
        bmark = jnp.zeros((nb_al,), jnp.int32).at[ablock_start].add(
            1, mode="drop")
        blk_tile = jnp.clip(jnp.cumsum(bmark) - 1, 0, num_tiles - 1)
        blk_k = jnp.arange(nb_al, dtype=jnp.int32) - ablock_start[blk_tile]
        src_lo = tile_start[blk_tile] + blk_k * BLOCK
        vcnt = jnp.clip(tile_count[blk_tile] - blk_k * BLOCK, 0, BLOCK)
        aligned_blocks = realign_runs(flat_entries, src_lo, vcnt, nb_al)
    else:
        ablock_start = jnp.zeros_like(tile_start)
        aligned_blocks = jnp.zeros((0, S_ATTRS, BLOCK), jnp.float32)

    return SurfelBinned(
        aligned_blocks=aligned_blocks,
        flat_entries=flat_entries,
        tile_count=tile_count,
        ablock_start=ablock_start,
        tile_start=tile_start,
        sorted_tile=sort_tile,
        num_rendered=total,
        slot_gauss=g.astype(jnp.int32),
        compact_gid=jnp.arange(n, dtype=jnp.int32),  # preprocess order
    )


_FLAT_WIN = 4 * 128  # flat-mode window lanes (see rasterize_pallas)


def _surfel_kernel(ablock_ref, count_ref, blocks_hbm, out_ref, scratch, sems,
                   *, grid_x: int, tiles_per_prog: int,
                   flat_mode: bool = False, k_total: int = 0,
                   with_median: bool = True, packed: bool = False,
                   with_nc: bool = True):
    gprog = pl.program_id(0)
    subl = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    qx = (q % TILE_X).astype(jnp.float32)
    qy = (q // TILE_X).astype(jnp.float32)

    def tile_meta(t):
        return ablock_ref[t], (count_ref[t] + BLOCK - 1) // BLOCK

    def flat_anchor(b0, blk_idx):
        src = b0 + blk_idx * BLOCK
        return jnp.minimum(src // 128, (k_total - _FLAT_WIN) // 128) * 128

    def block_dma(b0, blk_idx, slot):
        if flat_mode:
            return pltpu.make_async_copy(
                blocks_hbm.at[:, pl.ds(flat_anchor(b0, blk_idx), _FLAT_WIN)],
                scratch.at[slot], sems.at[slot],
            )
        return pltpu.make_async_copy(
            blocks_hbm.at[b0 + blk_idx], scratch.at[slot], sems.at[slot]
        )

    def start_first_dma(i, t):
        b0, nb = tile_meta(t)

        @pl.when(nb > 0)
        def _():
            block_dma(b0, 0, 2 + i % 2).start()

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
            return block_dma(b0, blk_idx, slot)

        row = lambda v: jnp.full((1, TILE_PIXELS), v, jnp.float32)
        init = (
            jnp.zeros((), jnp.int32),
            row(1.0),  # T (last APPLIED transmittance, always >= eps)
            row(1.0),  # alive: sticky termination (see rasterize_pallas)
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
            c, alive = state[0], state[2]
            return (c < n_blocks) & (jnp.max(alive) > 0.0)

        def block_math(rows, row_off, get_blk, c, carry):
            # sub-block twin of rasterize_pallas._composite_kernel: the math
            # is identical on any (rows, 256) slice of the block, so
            # partially-empty or terminated slices cost proportionally less
            (T, alive, r, gg, b, D, n0, n1, n2, md, mwt, mi, m2, nc) = carry
            sub = subl[:rows]
            blk = get_blk(row_off, rows)  # (24, rows) -> (rows, 24)

            if packed:
                # in-kernel decode of the packed int32 surfel table (see
                # SURFEL_PACK at bin_surfels_fast): M and mean2d are
                # TILE-RELATIVE and M per-entry normalized, so the
                # homography and the 2D low-pass evaluate against the
                # LOCAL (qx, qy) in [0, 16) — no absolute reconstruction
                bcf = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
                mx = [_half_lo(blk[:, k:k + 1]) for k in range(3)]
                my = [_half_hi(blk[:, k:k + 1]) for k in range(3)]
                mw = [_half_lo(blk[:, 3:4]), _half_hi(blk[:, 3:4]),
                      _half_lo(blk[:, 4:5])]
                op = _half_hi(blk[:, 4:5])
                dk0 = _half_lo(blk[:, 5:6]) * _PK_DK_SCALE
                dk1 = _half_hi(blk[:, 5:6]) * _PK_DK_SCALE
                dk2 = bcf(blk[:, 6:7])
                rgb = blk[:, 7:8]
                col_r = (rgb & 1023).astype(jnp.float32) * _RGB10_INV
                col_g = ((rgb >> 10) & 1023).astype(jnp.float32) * _RGB10_INV
                col_b = ((rgb >> 20) & 1023).astype(jnp.float32) * _RGB10_INV
                if SURFEL_NPACK:
                    npk = blk[:, 8:9]
                    dqn = lambda q: (q.astype(jnp.float32) - 512.0) * (1 / 511.0)
                    nr0 = dqn(npk & 1023)
                    nr1 = dqn((npk >> 10) & 1023)
                    nr2 = dqn((npk >> 20) & 1023)
                    gid = bcf(blk[:, 9:10])
                else:
                    nr0 = _half_lo(blk[:, 8:9])
                    nr1 = _half_hi(blk[:, 8:9])
                    nr2 = _half_lo(blk[:, 9:10])
                    gid = bcf(blk[:, 10:11])
                # 2D-filter center from the homography's (0,0,1) image —
                # (rows, 1) column math, cheaper than a sort operand
                rw2 = 1.0 / jnp.where(jnp.abs(mw[2]) < 1e-12, 1e-12, mw[2])
                cx = mx[2] * rw2
                cy = my[2] * rw2
                vld = None
                ex, ey = qx, qy
            else:
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
                ex, ey = px, py

            # two-plane ray-splat intersection (reference _surfel_alpha).
            if packed and SURFEL_ADJ:
                # The per-pixel cross product s = (ex*Mw-Mx) x (ey*Mw-My)
                # is AFFINE in the pixel coords (the ex*ey cross terms
                # cancel: s_k = a_k*ex + b_k*ey + c_k with (a, b, c) the
                # adjugate minors of M) — the 21 per-pixel (rows, 256) ops
                # of the hu/hv form collapse to 6 FMAs, with the 9 minors
                # computed once per ENTRY on (rows, 1) columns. SAFE ONLY
                # HERE: the packed table is tile-relative + normalized, so
                # the minor products stay O(1); at global coordinates the
                # minors reach ~1e6 with catastrophic cancellation against
                # px ~ 1e3 (on-chip grad relmax 7.5e-3 when the unpacked
                # train path used this form — reverted there).
                # (aj/bj/cj names: bare b0 would shadow the tile base.)
                aj0 = mw[2] * my[1] - mw[1] * my[2]
                bj0 = mx[2] * mw[1] - mx[1] * mw[2]
                cj0 = mx[1] * my[2] - mx[2] * my[1]
                aj1 = mw[0] * my[2] - mw[2] * my[0]
                bj1 = mx[0] * mw[2] - mx[2] * mw[0]
                cj1 = mx[2] * my[0] - mx[0] * my[2]
                aj2 = mw[1] * my[0] - mw[0] * my[1]
                bj2 = mx[1] * mw[0] - mx[0] * mw[1]
                cj2 = mx[0] * my[1] - mx[1] * my[0]
                s0 = aj0 * ex + bj0 * ey + cj0  # (rows, 256)
                s1 = aj1 * ex + bj1 * ey + cj1
                s2 = aj2 * ex + bj2 * ey + cj2
            else:
                hu = [ex * mw[k] - mx[k] for k in range(3)]
                hv = [ey * mw[k] - my[k] for k in range(3)]
                s0 = hu[1] * hv[2] - hu[2] * hv[1]
                s1 = hu[2] * hv[0] - hu[0] * hv[2]
                s2 = hu[0] * hv[1] - hu[1] * hv[0]
            sz = jnp.where(jnp.abs(s2) < 1e-9, 1e-9, s2)
            # one reciprocal + two muls instead of two (rows, 256) divides
            rz = 1.0 / sz
            u = s0 * rz
            v = s1 * rz
            rho3d = u * u + v * v

            dx = cx - ex
            dy = cy - ey
            rho2d = (dx * dx + dy * dy) / _FILTER_2D_VAR

            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            # 2D-branch depth = center depth (reference 2DGS semantics)
            depth = jnp.where(use3d, dk0 * u + dk1 * v + dk2, dk2)
            # dead-entry masks folded INTO the exp argument (exp(-1e4) is
            # exactly 0 in f32): behind-camera intersections, and either
            # the run-count mask (flat runs contain only valid entries;
            # rows past the count hold the NEXT tile's — packed ALIGNED
            # blocks zero their padding and mask by count too) or the
            # realign valid row
            if flat_mode or packed:
                invalid = c * BLOCK + row_off + sub >= count_ref[t]
            else:
                invalid = vld < 0.5
            G = jnp.exp(jnp.where((depth <= NEAR_CULL_Z) | invalid,
                                  -1e4, -0.5 * rho))
            alpha = jnp.minimum(_ALPHA_MAX, op * G)
            # sub-threshold contributions are skipped
            alpha = jnp.where(alpha < _ALPHA_MIN, 0.0, alpha)

            # entry-axis inclusive prefix product of (1 - alpha)
            cum = 1.0 - alpha
            sft = 1
            while sft < rows:
                shifted = pltpu.roll(cum, sft, axis=0)
                shifted = jnp.where(sub < sft, 1.0, shifted)
                cum = cum * shifted
                sft *= 2

            # exclusive prefix via a one-entry roll (see rasterize_pallas):
            # replaces the (rows, 256) divide P_incl/(1-alpha)
            exc = jnp.where(sub < 1, 1.0, pltpu.roll(cum, 1, axis=0))
            P_incl = T * cum
            P_excl = T * exc
            # sticky termination: without the alive gate a saturated pixel
            # resurrects at block boundaries (T carries the last APPLIED
            # value >= eps), inflating n_contrib past entries the forward
            # skipped — which the nc-trusting backward then wrongly folds
            # into its 1/(1-alpha) transmittance reconstruction
            applied = (P_incl >= _TERM_EPS) & (alive > 0.0)
            w = jnp.where(applied, alpha * P_excl, 0.0)

            r = r + jnp.sum(w * col_r, axis=0, keepdims=True)
            gg = gg + jnp.sum(w * col_g, axis=0, keepdims=True)
            b = b + jnp.sum(w * col_b, axis=0, keepdims=True)
            D = D + jnp.sum(w * depth, axis=0, keepdims=True)
            n0 = n0 + jnp.sum(w * nr0, axis=0, keepdims=True)
            n1 = n1 + jnp.sum(w * nr1, axis=0, keepdims=True)
            n2 = n2 + jnp.sum(w * nr2, axis=0, keepdims=True)
            m2 = m2 + jnp.sum(w * depth * depth, axis=0, keepdims=True)

            # end-of-block raw product = the LAST prefix row (monotone):
            # a static (1, 256) slice instead of a tree min-reduction;
            # must read the pre-update T
            alive = alive * (T * cum[rows - 1:rows, :]
                             >= _TERM_EPS).astype(jnp.float32)
            T = jnp.minimum(
                T, jnp.min(jnp.where(applied, P_incl, jnp.inf), axis=0,
                           keepdims=True)
            )

            if with_median:
                # median trio (0.5-crossing): the crossing is UNIQUE over
                # the whole walk (the applied P chain is monotone), so
                # plain accumulation replaces the any-reduction +
                # crossed-selects. The alpha > 0 term is NOT redundant:
                # dead rows' P_excl/P_incl associate differently in the
                # prefix tree (+-1 ulp), so a chain straddling 0.5 within
                # a ulp could double-fire on a dead row.
                # Skipped in training, whose loss never reads it.
                cross = (applied & (alpha > 0.0)
                         & (P_excl > 0.5) & (P_incl < 0.5))
                md = md + jnp.sum(jnp.where(cross, depth, 0.0), 0,
                                  keepdims=True)
                mwt = mwt + jnp.sum(jnp.where(cross, w, 0.0), 0,
                                    keepdims=True)
                mi = mi + jnp.sum(jnp.where(cross, gid, 0.0), 0,
                                  keepdims=True)

            if with_nc:
                # n_contrib feeds only the nc-trusting backward; inference
                # (mesh extraction) never reads it — skip the tracking
                pos1 = (c * BLOCK + row_off + sub + 1).astype(jnp.float32)
                nc = jnp.maximum(nc, jnp.max(jnp.where(w > 0.0, pos1, 0.0),
                                             0, keepdims=True))
            return (T, alive, r, gg, b, D, n0, n1, n2, md, mwt, mi, m2, nc)

        def body(state):
            c = state[0]
            carry = state[1:]
            slot = jnp.where(c == 0, 2 + i % 2, c % 2)

            @pl.when(c + 1 < n_blocks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()

            if flat_mode:
                # one window roll per 256-entry block, hoisted out of the
                # sub-block loop (the in-kernel realign equivalent)
                off = b0 + c * BLOCK - flat_anchor(b0, c)
                rolled = pltpu.roll(
                    scratch[slot], (_FLAT_WIN - off) % _FLAT_WIN, axis=1
                )
                get_blk = lambda o, rows: rolled[:, o:o + rows].T
            else:
                get_blk = lambda o, rows: scratch[slot][:, o:o + rows].T

            rem = count_ref[t] - c * BLOCK  # only the last block is partial
            if _SUBBLK:
                # sub-block early termination (see rasterize_pallas): skip
                # slices past the tile's count or once every pixel is dead
                carry = block_math(_SUBBLK, 0, get_blk, c, carry)
                for s in range(1, BLOCK // _SUBBLK):
                    o = s * _SUBBLK

                    def do(a, o=o):
                        return block_math(_SUBBLK, o, get_blk, c, a)

                    carry = jax.lax.cond(
                        (rem > o) & (jnp.max(carry[1]) > 0.0),
                        do, lambda a: a, carry,
                    )
            else:
                # straight-line sub-block decomposition (see
                # rasterize_pallas GS_SB_SL): full/half block instances run
                # as cond-free width-_SB_SL slices — k slices of width w
                # pay k*log2(w)*(w/BLOCK) prefix-roll work vs log2(kw)
                def leaf(width, a):
                    if _SB_SL and width > _SB_SL:
                        for off in range(0, width, _SB_SL):
                            a = block_math(_SB_SL, off, get_blk, c, a)
                        return a
                    return block_math(width, 0, get_blk, c, a)

                carry = jax.lax.cond(
                    rem <= BLOCK // 4,
                    lambda a: leaf(BLOCK // 4, a),
                    lambda a: jax.lax.cond(
                        rem <= BLOCK // 2,
                        lambda b: leaf(BLOCK // 2, b),
                        lambda b: leaf(BLOCK, b),
                        a,
                    ),
                    carry,
                )
            return (c + 1,) + carry

        state = jax.lax.while_loop(cond, body, init)
        c_fin, T, _alive, r, gg, b, D, n0, n1, n2, md, mwt, mi, m2, nc = state

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
                            tiles_per_prog: int = 8,
                            use_flat: bool = False,
                            with_median: bool = True,
                            with_nc: bool = True):
    """[T, 16, 256] packed surfel buffers: rows 0-2 rgb, 3 depth-sum (=m1),
    4-6 view normal, 7 med_d, 8 med_w, 9 med_i, 10 final_T, 11 m2,
    12 n_contrib."""
    num_tiles = grid_x * grid_y
    padded = -(-num_tiles // tiles_per_prog) * tiles_per_prog
    pad = padded - num_tiles
    # GS_PACK_ALIGN: packed table was realigned into 256-aligned int32
    # blocks — aligned addressing (no roll) with the packed decode
    packed_aligned = (use_flat and binned.aligned_blocks.size > 0
                      and binned.aligned_blocks.dtype == jnp.int32)
    if packed_aligned:
        use_flat = False
    start = binned.tile_start if use_flat else binned.ablock_start
    ablock_start = jnp.pad(start, (0, pad))
    tile_count = jnp.pad(binned.tile_count, (0, pad))
    k_total = binned.flat_entries.shape[1]
    win = _FLAT_WIN if use_flat else BLOCK
    packed = packed_aligned or (
        use_flat and binned.flat_entries.dtype == jnp.int32)
    n_rows = binned.flat_entries.shape[0] if packed else S_ATTRS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(padded // tiles_per_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tiles_per_prog, NUM_OUT, TILE_PIXELS), lambda t, s, c: (t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((4, n_rows, win),
                       jnp.int32 if packed else jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = partial(_surfel_kernel, grid_x=grid_x,
                     tiles_per_prog=tiles_per_prog, flat_mode=use_flat,
                     k_total=k_total, with_median=with_median, packed=packed,
                     with_nc=with_nc)
    data = binned.flat_entries if use_flat else binned.aligned_blocks
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, NUM_OUT, TILE_PIXELS), jnp.float32),
        grid_spec=grid_spec,
        # self-contained tile-group programs: core-splittable on megacore
        # TPU gens (see rasterize_pallas.composite_pallas)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(ablock_start, tile_count, data)
    return out[:num_tiles]
