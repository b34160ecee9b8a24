"""Pallas TPU backward compositor — per-tile reverse walk.

The training-speed counterpart of the CUDA backward render kernel
(backward.cu:415-610): per tile, entry blocks are walked back-to-front,
transmittance is reconstructed by division (backward.cu:535) as a lane
*suffix* product, and the behind-the-entry accumulators (accum_rec,
backward.cu:550-580) are lane suffix sums — the mirror image of the forward
kernel's prefix product.  Per-entry gradients are reduced over the 256
pixel sublanes and accumulated into per-entry gradient blocks with
read-modify-write DMA (safe: the TPU grid executes sequentially), then an
XLA (gid)-keyed sort + segmented sum replaces atomicAdd for the final
per-Gaussian reduction.

Per-entry gradient block rows (aligned with binning_fast's entry layout):
0:d_mx 1:d_my 2:d_ca 3:d_cb 4:d_cc 5:d_op 6:d_r 7:d_g 8:d_b 9:d_depth.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops.binning_fast import BLOCK, NUM_ATTRS, BinnedBlocks
from gaustudio_tpu.ops.gaussian import TILE_PIXELS, TILE_X, TILE_Y

_TERM_EPS = 1e-4
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99

# dL tile-block channels
_CT = 8  # dr dg db dD dO dMed final_T n_contrib


def _suffix_incl_prod(x, lane):
    cum = x
    sft = 1
    while sft < BLOCK:
        shifted = pltpu.roll(cum, BLOCK - sft, axis=1)  # == roll by -sft
        shifted = jnp.where(lane >= BLOCK - sft, 1.0, shifted)
        cum = cum * shifted
        sft *= 2
    return cum


def _suffix_incl_sum(x, lane):
    cum = x
    sft = 1
    while sft < BLOCK:
        shifted = pltpu.roll(cum, BLOCK - sft, axis=1)  # == roll by -sft
        shifted = jnp.where(lane >= BLOCK - sft, 0.0, shifted)
        cum = cum + shifted
        sft *= 2
    return cum


def _backward_kernel(start_ref, count_ref, bg_ref, grads_in, ct_ref,
                     blocks_hbm, grads_out, scratch, gscr, sems, gsem,
                     *, grid_x: int, tiles_per_prog: int):
    g_prog = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, 1), 0)
    qx = (q % TILE_X).astype(jnp.float32)
    qy = (q // TILE_X).astype(jnp.float32)

    def tile_body(i, _):
        t = g_prog * tiles_per_prog + i
        start = start_ref[t]
        count = count_ref[t]
        b0 = start // BLOCK
        n_blocks = (start + count + BLOCK - 1) // BLOCK - b0

        tx = (t % grid_x).astype(jnp.float32)
        ty = (t // grid_x).astype(jnp.float32)
        px = tx * TILE_X + qx
        py = ty * TILE_Y + qy

        ct = ct_ref[i]  # (256, 8)
        dCr = ct[:, 0:1]
        dCg = ct[:, 1:2]
        dCb = ct[:, 2:3]
        dD = ct[:, 3:4]
        dO = ct[:, 4:5]
        dMed = ct[:, 5:6]
        Tf = ct[:, 6:7]
        nc = ct[:, 7:8]
        bgdot = bg_ref[0] * dCr + bg_ref[1] * dCg + bg_ref[2] * dCb  # (256,1)

        def get_dma(slot, blk_idx):
            return pltpu.make_async_copy(
                blocks_hbm.at[b0 + blk_idx], scratch.at[slot], sems.at[slot]
            )

        @pl.when(n_blocks > 0)
        def _():
            get_dma(0, n_blocks - 1).start()

        init = (
            jnp.zeros((), jnp.int32),  # reverse step r: block index = n_blocks-1-r
            Tf + jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # T after stream
            jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # S_r
            jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # S_g
            jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # S_b
            jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # SD
            jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # SO
        )

        def cond(state):
            return state[0] < n_blocks

        def body(state):
            r, Tc, Sr, Sg, Sb, SD, SO = state
            c = n_blocks - 1 - r
            slot = r % 2

            @pl.when(r + 1 < n_blocks)
            def _():
                get_dma((r + 1) % 2, c - 1).start()

            get_dma(slot, c).wait()
            blk = scratch[slot]  # (16, BLOCK)

            mx = blk[0:1, :]
            my = blk[1:2, :]
            ca = blk[2:3, :]
            cb = blk[3:4, :]
            cc = blk[4:5, :]
            op = blk[5:6, :]
            col_r = blk[6:7, :]
            col_g = blk[7:8, :]
            col_b = blk[8:9, :]
            dep = blk[9:10, :]
            vld = blk[11:12, :]

            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            Ge = jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.minimum(_ALPHA_MAX, op * Ge)
            pos = (b0 + c) * BLOCK + lane - start
            in_range = (pos >= 0) & (pos < count)
            alpha = jnp.where(
                (power > 0.0) | (alpha < _ALPHA_MIN) | (vld < 0.5) | ~in_range,
                0.0,
                alpha,
            )
            contrib = (alpha > 0.0) & (pos < nc.astype(jnp.int32))

            one_m = 1.0 - alpha
            factor = jnp.where(contrib, one_m, 1.0)
            revincl = _suffix_incl_prod(factor, lane)
            Tb = Tc / revincl  # transmittance BEFORE each entry (test_T)
            w = jnp.where(contrib, alpha * Tb, 0.0)

            wc_r = w * col_r
            wc_g = w * col_g
            wc_b = w * col_b
            wd = w * dep

            Sr_e = Sr + _suffix_incl_sum(wc_r, lane) - wc_r
            Sg_e = Sg + _suffix_incl_sum(wc_g, lane) - wc_g
            Sb_e = Sb + _suffix_incl_sum(wc_b, lane) - wc_b
            SD_e = SD + _suffix_incl_sum(wd, lane) - wd
            SO_e = SO + _suffix_incl_sum(w, lane) - w

            dL_dalpha = (
                Tb * (col_r * dCr + col_g * dCg + col_b * dCb)
                - (Sr_e * dCr + Sg_e * dCg + Sb_e * dCb) / one_m
                + Tb * dep * dD - SD_e / one_m * dD
                + Tb * dO - SO_e / one_m * dO
                - Tf / one_m * bgdot
            )
            dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

            T_after = Tb * one_m
            cross = contrib & (Tb > 0.5) & (T_after < 0.5)

            dL_dG = op * dL_dalpha
            dpow = Ge * dL_dG
            d_mx = jnp.sum(dpow * (-(ca * dx + cb * dy)), axis=0, keepdims=True)
            d_my = jnp.sum(dpow * (-(cc * dy + cb * dx)), axis=0, keepdims=True)
            d_ca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
            d_cb = jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True)
            d_cc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
            d_op = jnp.sum(Ge * dL_dalpha, axis=0, keepdims=True)
            d_r = jnp.sum(w * dCr, axis=0, keepdims=True)
            d_g = jnp.sum(w * dCg, axis=0, keepdims=True)
            d_b = jnp.sum(w * dCb, axis=0, keepdims=True)
            d_dep = jnp.sum(w * dD + jnp.where(cross, dMed, 0.0), axis=0,
                            keepdims=True)

            # accumulate into the per-entry gradient block (RMW; the grid is
            # sequential so cross-program accumulation is race-free)
            rd = pltpu.make_async_copy(grads_in.at[b0 + c], gscr, gsem)
            rd.start()
            rd.wait()
            gnew = gscr[:, :]
            upd = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_r, d_g, d_b, d_dep,
                 jnp.zeros((6, BLOCK), jnp.float32)],
                axis=0,
            )
            gscr[:, :] = gnew + upd
            wr = pltpu.make_async_copy(gscr, grads_out.at[b0 + c], gsem)
            wr.start()
            wr.wait()

            # carries: transmittance before this block's first entry (lane 0
            # of Tb) and the grown suffix sums (whole-block contributions)
            Tc = Tb[:, 0:1]
            Sr = Sr + _block_total(wc_r)
            Sg = Sg + _block_total(wc_g)
            Sb = Sb + _block_total(wc_b)
            SD = SD + _block_total(wd)
            SO = SO + _block_total(w)
            return (r + 1, Tc, Sr, Sg, Sb, SD, SO)

        jax.lax.while_loop(cond, body, init)
        return 0

    jax.lax.fori_loop(0, tiles_per_prog, tile_body, 0)


def _block_total(x):
    return jnp.sum(x, axis=1, keepdims=True)


def composite_backward_pallas(binned: BinnedBlocks, ct_tiles, bg,
                              grid_x: int, grid_y: int,
                              tiles_per_prog: int = 16):
    """Per-entry gradient blocks [NB, 16, BLOCK] (rows per module docstring).

    Args:
        ct_tiles: [T, 256, 8] packed per-tile cotangents + forward state
            (dr dg db dD dO dMed final_T n_contrib).
        bg: [3] background color (for the reference bg gradient term).
    """
    num_tiles = grid_x * grid_y
    nb = binned.entry_blocks.shape[0]
    padded = -(-num_tiles // tiles_per_prog) * tiles_per_prog
    pad = padded - num_tiles
    tile_start = jnp.pad(binned.tile_start, (0, pad))
    tile_count = jnp.pad(binned.tile_count, (0, pad))
    ct_tiles = jnp.pad(ct_tiles, ((0, pad), (0, 0), (0, 0)))
    bg8 = jnp.pad(jnp.asarray(bg, jnp.float32), (0, 5))

    grads_zero = jnp.zeros((nb, NUM_ATTRS, BLOCK), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(padded // tiles_per_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tiles_per_prog, TILE_PIXELS, _CT),
                         lambda t, s, c, b: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ATTRS, BLOCK), jnp.float32),
            pltpu.VMEM((NUM_ATTRS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = partial(_backward_kernel, grid_x=grid_x,
                     tiles_per_prog=tiles_per_prog)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, NUM_ATTRS, BLOCK), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tile_start, tile_count, bg8, grads_zero, ct_tiles, binned.entry_blocks)


def reduce_entry_grads(grad_blocks, binned: BinnedBlocks, num_gaussians: int):
    """Per-entry gradient blocks -> per-Gaussian gradients.

    The TPU substitute for backward.cu's atomicAdd: sort the flat per-entry
    gradients by gaussian id (XLA radix sort), then a sorted segmented sum.
    """
    flat_g = grad_blocks.transpose(0, 2, 1).reshape(-1, NUM_ATTRS)[:, :10]
    flat_e = binned.entry_blocks.transpose(0, 2, 1).reshape(-1, NUM_ATTRS)
    gid = flat_e[:, 10].astype(jnp.int32)
    valid = flat_e[:, 11] > 0.5
    key = jnp.where(valid, gid, num_gaussians)

    cols = tuple(flat_g[:, a] for a in range(10))
    sorted_ops = jax.lax.sort((key,) + cols, num_keys=1, is_stable=True)
    skey = sorted_ops[0]
    sums = [
        jax.ops.segment_sum(c, skey, num_segments=num_gaussians + 1,
                            indices_are_sorted=True)[:num_gaussians]
        for c in sorted_ops[1:]
    ]
    d_means2d = jnp.stack([sums[0], sums[1]], -1)
    d_conic = jnp.stack([sums[2], sums[3], sums[4]], -1)
    d_opac = sums[5]
    d_colors = jnp.stack([sums[6], sums[7], sums[8]], -1)
    d_depths = sums[9]
    return d_means2d, d_conic, d_colors, d_depths, d_opac
