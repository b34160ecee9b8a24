"""Pallas TPU backward compositor — per-tile reverse walk.

The training-speed counterpart of the CUDA backward render kernel
(backward.cu:415-610): per tile, entry blocks are walked back-to-front,
transmittance is reconstructed by division (backward.cu:535) as an entry-
axis *suffix* product, and the behind-the-entry accumulators (accum_rec,
backward.cu:550-580) collapse into ONE suffix sum by pre-dotting the
per-entry payload with the per-pixel cotangents:

    q_i = w_i * (col_i . dC + dep_i * dD + dO)
    Sr_e.dCr + Sg_e.dCg + Sb_e.dCb + SD_e.dD + SO_e.dO  ==  suffix_excl(q)

(the same sum reassociated per-entry instead of per-channel), so the five
suffix scans of the naive translation become two (one product, one sum).

Layout matches the forward kernel: entries on sublanes, pixels on lanes —
per-pixel carries are (1, 256) single-vreg rows. Per-entry gradients are
reduced over the 256 pixel lanes and accumulated into per-entry gradient
blocks with read-modify-write DMA (safe: the TPU grid executes
sequentially), then reduced per Gaussian (see reduce_entry_grads).

Per-entry gradient block rows (aligned with binning_fast's entry layout):
0:d_mx 1:d_my 2:d_ca 3:d_cb 4:d_cc 5:d_op 6:d_r 7:d_g 8:d_b 9:d_depth.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops import binning_fast as BF
from gaustudio_tpu.ops.binning_fast import BLOCK, NUM_ATTRS, BinnedBlocks
from gaustudio_tpu.ops.gaussian import TILE_PIXELS, TILE_X, TILE_Y

_TERM_EPS = 1e-4
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99

# dL tile-block channels
_CT = 8  # dr dg db dD dO dMed final_T n_contrib

# MXU mode for the backward block math (see rasterize_pallas.COMP_DOT3):
# power via the rank-6 bilinear form, and the five conic/mean gradient
# reductions via pixel-basis moments M_k = sum_p dpow * g_k(p) — ONE
# 3-plane (rows, 256) @ (256, 8) matmul replaces five masked lane
# reductions plus their feeding elementwise products. Gradient error vs
# the VPU path is bounded by the 3-plane residual (~2^-22 relative per
# term, plus cancellation in the moment recombination) — hold to ~1e-4
# relative before enabling for training. Default OFF until on-chip
# parity + timing confirm.
BWD_DOT3 = __import__("os").environ.get("GS_BWD_DOT3", "0") == "1"


def _suffix_incl_prod(x, subl, rows=BLOCK):
    cum = x
    sft = 1
    while sft < rows:
        shifted = pltpu.roll(cum, rows - sft, axis=0)  # == roll by -sft
        shifted = jnp.where(subl >= rows - sft, 1.0, shifted)
        cum = cum * shifted
        sft *= 2
    return cum


def _suffix_incl_sum(x, subl, rows=BLOCK):
    cum = x
    sft = 1
    while sft < rows:
        shifted = pltpu.roll(cum, rows - sft, axis=0)  # == roll by -sft
        shifted = jnp.where(subl >= rows - sft, 0.0, shifted)
        cum = cum + shifted
        sft *= 2
    return cum


def _backward_kernel(start_ref, count_ref, bg_ref, grads_in, ct_ref,
                     blocks_hbm, grads_out, scratch, gscr, sems, gsem_r,
                     gsem_w, *, grid_x: int, tiles_per_prog: int):
    g_prog = pl.program_id(0)
    subl = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    q_pix = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    qx = (q_pix % TILE_X).astype(jnp.float32)
    qy = (q_pix // TILE_X).astype(jnp.float32)
    if BWD_DOT3:
        from gaustudio_tpu.ops.rasterize_pallas import _power_dot3, _dot3_matmul

        # integer-valued pixel basis, exact in bf16 (values <= 225)
        basis = jnp.concatenate(
            [qx * qx, qy * qy, qx * qy, qx, qy,
             jnp.ones_like(qx), jnp.zeros_like(qx), jnp.zeros_like(qx)],
            axis=0,
        )  # (8, 256)
        G_basis = basis.astype(jnp.bfloat16)
        G_T = basis.T.astype(jnp.bfloat16)  # (256, 8) for moments

    # entry-block slots 0/1 ping-pong within a tile; slots 2/3 hold tiles'
    # LAST blocks (the reverse walk's first read), prefetched one tile ahead.
    # The walk stops at the forward's last contributing entry: positions
    # >= max_pixel(n_contrib) have contrib=False on every pixel (factor 1,
    # q 0, zero grads), so clamping count to that maximum skips whole
    # trailing blocks exactly — the TPU substitute for the CUDA backward's
    # contributor > last_contributor skip (backward.cu:477), but at block
    # granularity instead of per-thread.
    def tile_meta(t, i):
        start = start_ref[t]
        nc_max = jnp.max(ct_ref[i, 7:8, :]).astype(jnp.int32)
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

        ct = ct_ref[i]  # (8, 256): channel rows, pixel lanes
        dCr = ct[0:1, :]
        dCg = ct[1:2, :]
        dCb = ct[2:3, :]
        dD = ct[3:4, :]
        dO = ct[4:5, :]
        dMed = ct[5:6, :]
        Tf = ct[6:7, :]
        nc = ct[7:8, :]
        bgdot = bg_ref[0] * dCr + bg_ref[1] * dCg + bg_ref[2] * dCb  # (1,256)

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

        # the first grad-block read can only start once the previous tile's
        # writes have drained (adjacent tiles share boundary grad blocks)
        @pl.when(n_blocks > 0)
        def _():
            grad_read(0).start()

        init = (
            jnp.zeros((), jnp.int32),  # reverse step r: block index = n_blocks-1-r
            Tf + jnp.zeros((1, TILE_PIXELS), jnp.float32),  # T after stream
            jnp.zeros((1, TILE_PIXELS), jnp.float32),  # Sq (pre-dotted suffix)
        )

        def cond(state):
            return state[0] < n_blocks

        def block_math(rows, row_base, c, slot, Tc, Sq):
            """Backward-composite rows [row_base, row_base+rows) of block
            ``c``; returns (T-before-slice carry, Sq carry, (16, BLOCK)
            padded grad update). A tile's partial FIRST/LAST flat blocks
            run narrower instances (valid entries confined to one half),
            matching the forward kernel's boundary fast path."""
            sub = subl[:rows]
            blk = scratch[slot][:, row_base:row_base + rows].T  # (rows, 16)

            mx = blk[:, 0:1]
            my = blk[:, 1:2]
            ca = blk[:, 2:3]
            cb = blk[:, 3:4]
            cc = blk[:, 4:5]
            op = blk[:, 5:6]
            col_r = blk[:, 6:7]
            col_g = blk[:, 7:8]
            col_b = blk[:, 8:9]
            dep = blk[:, 9:10]
            vld = blk[:, 11:12]

            if BWD_DOT3:
                mxl = mx - tx * TILE_X
                myl = my - ty * TILE_Y
                power = _power_dot3(mxl, myl, ca, cb, cc, G_basis)
            else:
                dx = mx - px  # (rows, 256): entries x pixels
                dy = my - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            Ge = jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.minimum(_ALPHA_MAX, op * Ge)
            pos = (b0 + c) * BLOCK + row_base + sub - start
            in_range = (pos >= 0) & (pos < count)
            alpha = jnp.where(
                (power > 0.0) | (alpha < _ALPHA_MIN) | (vld < 0.5) | ~in_range,
                0.0,
                alpha,
            )
            contrib = (alpha > 0.0) & (pos < nc.astype(jnp.int32))

            one_m = 1.0 - alpha
            factor = jnp.where(contrib, one_m, 1.0)
            revincl = _suffix_incl_prod(factor, sub, rows)
            Tb = Tc / revincl  # transmittance BEFORE each entry (test_T)
            w = jnp.where(contrib, alpha * Tb, 0.0)

            # pre-dotted payload: col.dC + dep.dD + dO per (entry, pixel)
            payload = col_r * dCr + col_g * dCg + col_b * dCb + dep * dD + dO
            q = w * payload
            Sq_e = Sq + _suffix_incl_sum(q, sub, rows) - q

            dL_dalpha = Tb * payload - Sq_e / one_m - Tf / one_m * bgdot
            dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

            T_after = Tb * one_m
            cross = contrib & (Tb > 0.5) & (T_after < 0.5)

            dL_dG = op * dL_dalpha
            dpow = Ge * dL_dG
            if BWD_DOT3:
                # moments M_k = sum_p dpow * g_k(p) in one 3-plane matmul;
                # the five conic/mean grads are exact recombinations over
                # dx = mxl - qx, dy = myl - qy
                M = _dot3_matmul(dpow, G_T)  # (rows, 8)
                Mx2, My2, Mxy = M[:, 0:1], M[:, 1:2], M[:, 2:3]
                Mx, My1, M1 = M[:, 3:4], M[:, 4:5], M[:, 5:6]
                Sdx = mxl * M1 - Mx
                Sdy = myl * M1 - My1
                d_mx = -(ca * Sdx + cb * Sdy)
                d_my = -(cc * Sdy + cb * Sdx)
                d_ca = -0.5 * (mxl * mxl * M1 - 2.0 * mxl * Mx + Mx2)
                d_cb = -(mxl * myl * M1 - mxl * My1 - myl * Mx + Mxy)
                d_cc = -0.5 * (myl * myl * M1 - 2.0 * myl * My1 + My2)
                d_op = M1 / jnp.maximum(op, 1e-12)
            else:
                d_mx = jnp.sum(dpow * (-(ca * dx + cb * dy)), axis=1,
                               keepdims=True)
                d_my = jnp.sum(dpow * (-(cc * dy + cb * dx)), axis=1,
                               keepdims=True)
                d_ca = jnp.sum(dpow * (-0.5 * dx * dx), axis=1, keepdims=True)
                d_cb = jnp.sum(dpow * (-dx * dy), axis=1, keepdims=True)
                d_cc = jnp.sum(dpow * (-0.5 * dy * dy), axis=1, keepdims=True)
                d_op = jnp.sum(Ge * dL_dalpha, axis=1, keepdims=True)
            d_r = jnp.sum(w * dCr, axis=1, keepdims=True)
            d_g = jnp.sum(w * dCg, axis=1, keepdims=True)
            d_b = jnp.sum(w * dCb, axis=1, keepdims=True)
            d_dep = jnp.sum(w * dD + jnp.where(cross, dMed, 0.0), axis=1,
                            keepdims=True)

            upd = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, d_dep,
                 jnp.zeros((rows, 6), jnp.float32)],
                axis=1,
            ).T  # (rows, 16) -> (16, rows)
            # pad to a full-width (16, BLOCK) update so the RMW add below is
            # branch-independent (out-of-slice lanes add zero)
            pads = []
            if row_base > 0:
                pads.append(jnp.zeros((NUM_ATTRS, row_base), jnp.float32))
            pads.append(upd)
            if row_base + rows < BLOCK:
                pads.append(jnp.zeros((NUM_ATTRS, BLOCK - row_base - rows),
                                      jnp.float32))
            upd_full = jnp.concatenate(pads, axis=1) if len(pads) > 1 else upd
            return Tb[0:1, :], Sq + jnp.sum(q, axis=0, keepdims=True), upd_full

        def body(state):
            r, Tc, Sq = state
            c = n_blocks - 1 - r
            # last block was prefetched into slot 2 + i%2 one tile ahead
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

            # accumulate into the per-entry gradient block. RMW is required
            # because boundary blocks are shared between adjacent tiles
            # (race-free: the grid and the per-tile loop run sequentially).
            # Reads are prefetched one block ahead and writes drain lazily:
            # W(r) is only waited before R(r+2) reuses its scratch slot, so
            # the DMAs overlap the compositing math instead of serializing.
            grad_read(r).wait()
            gscr[r % 2] = gscr[r % 2] + upd
            grad_write(r).start()

            @pl.when(r + 1 < n_blocks)
            def _():
                # R(r+1) reuses the slot W(r-1) wrote from; drain W(r-1)
                # first (r-1 and r+1 share parity)
                @pl.when(r >= 1)
                def _():
                    grad_write(r - 1).wait()

                grad_read(r + 1).start()

            # carries (computed in block_math): transmittance before this
            # block's first valid entry and the grown pre-dotted suffix sum
            return (r + 1, Tc, Sq)

        jax.lax.while_loop(cond, body, init)

        # drain outstanding grad writes before the next tile may RMW a
        # shared boundary block: W(nb-1) always, W(nb-2) if it was never
        # waited by an R(nb) (the guard above stops at the last block)
        @pl.when(n_blocks >= 2)
        def _():
            grad_write(n_blocks - 2).wait()

        @pl.when(n_blocks >= 1)
        def _():
            grad_write(n_blocks - 1).wait()

        return 0

    jax.lax.fori_loop(0, tiles_per_prog, tile_body, 0)


def composite_backward_pallas(binned: BinnedBlocks, ct_tiles, bg,
                              grid_x: int, grid_y: int,
                              tiles_per_prog: int = 16):
    """Per-entry gradients [16, K] flat (rows per module docstring), in the
    same tile-sorted order as ``binned.flat_entries``.

    Args:
        ct_tiles: [T, 8, 256] packed per-tile cotangents + forward state
            (channel rows dr dg db dD dO dMed final_T n_contrib, pixels on
            lanes).
        bg: [3] background color (for the reference bg gradient term).
    """
    num_tiles = grid_x * grid_y
    K = binned.flat_entries.shape[1]
    padded = -(-num_tiles // tiles_per_prog) * tiles_per_prog
    pad = padded - num_tiles
    tile_start = jnp.pad(binned.tile_start, (0, pad))
    tile_count = jnp.pad(binned.tile_count, (0, pad))
    ct_tiles = jnp.pad(ct_tiles, ((0, pad), (0, 0), (0, 0)))
    bg8 = jnp.pad(jnp.asarray(bg, jnp.float32), (0, 5))

    grads_zero = jnp.zeros((NUM_ATTRS, K), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(padded // tiles_per_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tiles_per_prog, _CT, TILE_PIXELS),
                         lambda t, s, c, b: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, NUM_ATTRS, BLOCK), jnp.float32),
            pltpu.VMEM((2, NUM_ATTRS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_backward_kernel, grid_x=grid_x,
                     tiles_per_prog=tiles_per_prog)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_ATTRS, K), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tile_start, tile_count, bg8, grads_zero, ct_tiles, binned.flat_entries)


# --- per-Gaussian gradient reduction ----------------------------------------
#
# The TPU substitute for backward.cu's atomicAdd. Sorted segment_sum is
# pathological on XLA-TPU (~15ms per column at 2.2M -> 150-220ms for the 10
# gradient columns), so instead:
#   1. sort the flat per-entry gradients back to SLOT order (the slot index
#      rides in entry row 12 through the tile sort) — in slot order the
#      slot->gaussian map `g` is monotone and gap-free;
#   2. a Pallas kernel reduces each 256-slot block onto its <=256-gaussian
#      window with one one-hot MXU matmul and accumulates program-local
#      windows into an attr-major [16, Npad] table with RMW lane-window DMA
#      (race-free: sequential grid);
#   3. one small scatter maps compact gaussian order back to original ids.

_SEG_SUPER = 8  # slot-blocks per segment-reduce program
_SEG_WIN = _SEG_SUPER * BLOCK + 2 * 128  # gaussian window lanes (aligned)


def _segreduce_kernel(blk_lo_ref, g_hbm, grads_hbm, out_in, out_hbm,
                      g_scr, gr_scr, win, sems, rmw_sem, *,
                      n_rows: int = NUM_ATTRS):
    sb = pl.program_id(0)
    nprog = pl.num_programs(0)

    # input windows are double-buffered across programs; only the output
    # RMW window stays serial (adjacent programs' windows overlap in lanes)
    def input_dmas(p, slot):
        base = p * _SEG_SUPER
        return (
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(base, _SEG_SUPER), :], g_scr.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                grads_hbm.at[:, pl.ds(base * BLOCK, _SEG_SUPER * BLOCK)],
                gr_scr.at[slot], sems.at[slot, 1],
            ),
        )

    @pl.when(sb == 0)
    def _():
        for dma in input_dmas(0, 0):
            dma.start()

    @pl.when(sb + 1 < nprog)
    def _():
        for dma in input_dmas(sb + 1, (sb + 1) % 2):
            dma.start()

    base_blk = sb * _SEG_SUPER
    lo_base = blk_lo_ref[base_blk]
    aligned = (lo_base // 128) * 128

    # RMW read of the overlapping output window must observe the previous
    # program's write — guaranteed by the sequential ("arbitrary") grid.
    dma_r = pltpu.make_async_copy(
        out_in.at[:, pl.ds(aligned, _SEG_WIN)], win, rmw_sem
    )
    dma_r.start()
    slot = sb % 2
    for dma in input_dmas(sb, slot):
        dma.wait()
    dma_r.wait()

    a128 = aligned // 128
    for b in range(_SEG_SUPER):
        lo_b = blk_lo_ref[base_blk + b]
        # accumulate into a 128-aligned 384-lane sub-window of the RMW
        # scratch; the sub-128 misalignment folds into a (256, 384) one-hot
        # (an earlier version built a window-wide accumulator and shifted
        # each block's 256 columns into place with a full-window
        # pltpu.roll — a ~147KB cross-lane shuffle per block)
        off_hi = jnp.minimum(lo_b // 128 - a128,
                             (_SEG_WIN - 3 * 128) // 128) * 128
        local = g_scr[slot, b, :] - (a128 + off_hi // 128) * 128  # [0, 384)
        # onehot: [slot, gauss_window_col] — col r sums slots with local==r
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 3 * 128), 1)
            == local[:, None]
        ).astype(jnp.float32)
        gblk = gr_scr[slot, :, b * BLOCK:(b + 1) * BLOCK]  # [16, 256 slots]
        if BF.SELECT_DOT3:
            # 3-plane bf16 decomposition of the grads; the one-hot is
            # bf16-exact — half the MXU passes of a HIGHEST f32 dot,
            # residual < 2^-24 relative (see binning_fast._onehot_select)
            from gaustudio_tpu.ops.rasterize_pallas import _dot3_matmul

            partial = _dot3_matmul(gblk, onehot.astype(jnp.bfloat16))
        else:
            partial = jax.lax.dot_general(
                gblk, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [16, 384 gaussian-window lanes]
        win[:, pl.ds(off_hi, 3 * 128)] = win[:, pl.ds(off_hi, 3 * 128)] + partial
    wr = pltpu.make_async_copy(win, out_hbm.at[:, pl.ds(aligned, _SEG_WIN)],
                               rmw_sem)
    wr.start()
    wr.wait()


def segment_reduce_compact(grads_table, g, block_lo, num_gaussians: int):
    """Sum slot-ordered gradient rows per compact gaussian.

    Args:
        grads_table: [n_rows, K] attr-major slot-ordered gradients
            (n_rows a multiple of 8; vanilla uses 16).
        g: [K] monotone slot -> compact gaussian map.
        block_lo: g[::BLOCK].
        num_gaussians: N.

    Returns [N, n_rows] sums in compact order.
    """
    n_rows = grads_table.shape[0]
    assert n_rows % 8 == 0
    K = g.shape[0]
    nb = K // BLOCK
    assert nb % _SEG_SUPER == 0
    npad = -(-num_gaussians // 128) * 128 + _SEG_WIN
    zeros = jnp.zeros((n_rows, npad), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // _SEG_SUPER,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, _SEG_SUPER, BLOCK), jnp.int32),
            pltpu.VMEM((2, n_rows, _SEG_SUPER * BLOCK), jnp.float32),
            pltpu.VMEM((n_rows, _SEG_WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(_segreduce_kernel, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct((n_rows, npad), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(block_lo, g.reshape(nb, BLOCK), grads_table, zeros)
    return out[:, :num_gaussians].T


def reduce_entry_grads(grads_flat, binned: BinnedBlocks, num_gaussians: int):
    """[16, K] per-entry gradients -> per-Gaussian gradients (original order)."""
    # entry row 12 carries the pre-tile-sort slot index
    slot_key = binned.flat_entries[12].astype(jnp.int32)

    cols = tuple(grads_flat[a] for a in range(10))
    if __import__("os").environ.get("GS_SEG_XLA", "0") == "1":
        # diagnostic fallback: gather + segment_sum (seconds-slow at entry
        # scale on XLA-TPU, but bypasses the Pallas segreduce entirely)
        gauss_of_entry = binned.slot_gauss[slot_key]
        sums_c = jax.ops.segment_sum(
            jnp.stack(cols, axis=1), gauss_of_entry,
            num_segments=num_gaussians,
        )
        sums_c = jnp.concatenate(
            [sums_c,
             jnp.zeros((num_gaussians, NUM_ATTRS - 10), jnp.float32)],
            axis=1,
        )
    else:
        sorted_ops = jax.lax.sort(
            (slot_key,) + cols, num_keys=1, is_stable=True)
        table = jnp.concatenate(
            [
                jnp.stack(sorted_ops[1:], axis=0),
                jnp.zeros((NUM_ATTRS - 10, slot_key.shape[0]), jnp.float32),
            ],
            axis=0,
        )  # [16, K] slot-ordered
        sums_c = segment_reduce_compact(
            table, binned.slot_gauss, binned.slot_gauss[::BLOCK],
            num_gaussians
        )  # [N, 16] compact order
    # compact -> original id (a permutation; one small unique scatter)
    sums = jnp.zeros((num_gaussians, NUM_ATTRS), jnp.float32).at[
        binned.compact_gid
    ].set(sums_c, mode="drop", unique_indices=True)

    d_means2d = sums[:, 0:2]
    d_conic = sums[:, 2:5]
    d_opac = sums[:, 5]
    d_colors = sums[:, 6:9]
    d_depths = sums[:, 9]
    return d_means2d, d_conic, d_colors, d_depths, d_opac
