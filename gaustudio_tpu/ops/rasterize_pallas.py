"""Pallas TPU forward compositor — the flagship rasterization kernel.

Replaces the XLA streaming compositor (rasterize_ref) for inference/bench:
one Pallas program per 16x16 tile walks its (tile,depth)-sorted entry
blocks front-to-back, carrying all per-pixel state in registers:

  * layout: entries on the 256-sublane axis, PIXELS on the 256-lane axis.
    Per-pixel carry state (T, color, median, ...) is then a (1, 256) lane
    vector = ONE vreg per op. The original orientation (pixels on
    sublanes) made every state op a (256, 1) column = 32 vregs with 1/128
    lanes active, costing ~3.8us of pure overhead per tile (31ms of the
    40ms compositor);
  * the sequential transmittance recurrence becomes a Hillis-Steele
    sublane prefix product (8 masked roll-multiply steps), exactly the
    associative reformulation validated against the CUDA semantics in
    rasterize_ref;
  * entry data streams from HBM with double-buffered DMA of the
    block-aligned [NB, 16, 256] layout built by binning_fast; one
    (16,256)->(256,16) in-VMEM transpose per block (4 vregs) yields the
    (256, 1) per-entry attribute columns;
  * per-tile early exit (forward.cu:318-320's block vote) is a while-loop
    condition on max transmittance.

Outputs are packed per tile as [T, 16, 256] (channel-major, pixels on
lanes, written as ONE (16, 256) store):
0:r 1:g 2:b 3:depth 4:med_depth 5:med_weight 6:med_id 7:final_T 8:n_contrib.
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
_MEDIAN_DEFAULT = 15.0

# Output rows per tile: 9 state rows (r,g,b,depth,med_d,med_w,med_i,T,nc)
# padded up for DMA-friendly sublane tiling. 16 was the historical default;
# 9 cuts the [T, NUM_OUT, 256] write traffic ~44% (A/B via GS_NUM_OUT).
NUM_OUT = int(__import__("os").environ.get("GS_NUM_OUT", "16"))
if NUM_OUT < 9 or (NUM_OUT != 9 and NUM_OUT % 8 != 0):
    # r4 sweep: a 9-row (non-8-multiple sublane) output block stalled the
    # Mosaic compile >17 min; values < 9 drop live state rows entirely
    # (inference with with_nc=False auto-selects an 8-row block — that path
    # is chosen by the kernel, not this knob)
    raise ValueError(
        f"GS_NUM_OUT={NUM_OUT}: need >= 9 and a multiple of 8 (or exactly "
        "9, at your own compile-time risk) — see docs/runs/r4_sweep.md")

# MXU power-matmul mode. The per-(entry, pixel) quadratic power is a rank-6
# bilinear form power = F(entry) @ G(pixel) with G = [qx^2, qy^2, qx*qy,
# qx, qy, 1] over INTEGER tile-local pixel coords (all values <= 225 —
# exactly bf16-representable), so three bf16 MXU passes over a 3-plane
# decomposition of F replace ~10 VPU ops on the (rows, 256) workload.
# Absolute power error < ~1e-3 (F plane sum carries ~24 mantissa bits);
# default OFF until on-chip parity + timing confirm.
COMP_DOT3 = __import__("os").environ.get("GS_COMP_DOT3", "0") == "1"


def _dot3_matmul(x, B):
    """3-plane bf16 decomposition of ``x`` contracted with an exactly-bf16
    operand ``B``: x (n, k) @ B (k, m) -> (n, m) f32, ~24 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda a: jax.lax.dot_general(
        a, B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dot(hi) + dot(mid) + dot(lo)


def _power_dot3(mxl, myl, ca, cb, cc, G):
    """3-plane bf16 MXU evaluation of the quadratic power on tile-local
    coordinates: (rows, 1) entry columns x (8, 256) pixel basis."""
    F = jnp.concatenate(
        [
            -0.5 * ca,
            -0.5 * cc,
            -cb,
            ca * mxl + cb * myl,
            cc * myl + cb * mxl,
            -(0.5 * ca * mxl * mxl + 0.5 * cc * myl * myl
              + cb * mxl * myl),
            jnp.zeros_like(ca),
            jnp.zeros_like(ca),
        ],
        axis=1,
    )  # (rows, 8)
    return _dot3_matmul(F, G)


_FLAT_WIN = 4 * 128  # flat-mode window lanes: 256-entry block at any
# 128-misaligned offset, plus slack so the end-of-table clamp keeps
# off + 256 <= window (K is a 256-multiple)

_PACKED_ROWS = 8  # packed flat table height (binning_fast packed mode)
_CONIC_INV = 1.0 / 16384.0  # matches binning_fast._CONIC_SCALE
# mirrors binning_fast.PACK_RGB10: the packed flat table carries colors as
# one 10-bit-per-channel int32 row and (conic_c, opacity) as an f16 pair
# (4 sort payload operands). Both modules read the same env at import, and
# a packed table only exists on the pack_geo inference path, so this flag
# alone determines the row layout the kernel must decode.
_PACK_RGB10 = __import__("os").environ.get("GS_PACK_RGB10", "1") == "1"
_RGB10_INV = 4.0 / 1023.0  # matches binning_fast._RGB10_SCALE


def _half_bits_to_f32(h):
    """Decode IEEE f16 bit patterns (int32, low 16 bits) to f32 without
    relying on Mosaic f16 support: shift the magnitude into the f32 layout
    and rescale by 2^112 (the exponent-bias delta). Exact for normal
    halves; f16 subnormals (<6.1e-5) decode through f32 denormals, which
    TPU flushes to zero — irrelevant at the packed values' scales."""
    mag = (h & jnp.int32(0x7FFF)) << 13
    f = jax.lax.bitcast_convert_type(mag, jnp.float32) * jnp.float32(2.0 ** 112)
    return jnp.where((h & jnp.int32(0x8000)) != 0, -f, f)


def _half_lo(u):
    return _half_bits_to_f32(u & jnp.int32(0xFFFF))


def _half_hi(u):
    return _half_bits_to_f32((u >> 16) & jnp.int32(0xFFFF))


def _composite_kernel(ablock_ref, count_ref, blocks_hbm, out_ref, scratch, sems,
                      *, grid_x: int, tiles_per_prog: int,
                      with_median: bool = True, flat_mode: bool = False,
                      k_total: int = 0, packed: bool = False,
                      with_nc: bool = True, num_out: int = NUM_OUT):
    """Tile compositor.

    Aligned mode (default): consumes realigned [NB, 16, 256] blocks.
    Flat mode (inference): reads 512-lane windows of the flat sorted
    entry table [16, K] directly and rolls each tile-run block into
    place in-kernel — the realign pass (and its 75%-padded aligned-blocks
    array) never materializes. ``ablock_ref`` then carries tile_start
    (flat entry offsets) instead of aligned block indices.
    """
    g = pl.program_id(0)
    # entries on sublanes: per-entry masks are (BLOCK, 1) columns
    subl = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    # pixels on lanes: per-pixel state is a (1, 256) row
    q = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    qx = (q % TILE_X).astype(jnp.float32)
    qy = (q // TILE_X).astype(jnp.float32)
    if COMP_DOT3:
        # integer-valued pixel basis, exact in bf16 (values <= 225)
        G_basis = jnp.concatenate(
            [qx * qx, qy * qy, qx * qy, qx, qy,
             jnp.ones_like(qx), jnp.zeros_like(qx), jnp.zeros_like(qx)],
            axis=0,
        ).astype(jnp.bfloat16)  # (8, 256)

    # DMA slot layout: slots 0/1 ping-pong for blocks >= 1 of the current
    # tile; slots 2..2+P hold tiles' FIRST blocks, prefetched GS_PREF_DEPTH
    # tiles ahead so the per-tile pipeline restart does not stall on HBM
    # latency (at ~1.1 blocks/tile the first-block fetch IS the tile's DMA
    # critical path).
    n_pref = max(2, _PREF_DEPTH + 1)

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
            block_dma(b0, 0, 2 + i % n_pref).start()

    for p in range(min(_PREF_DEPTH, tiles_per_prog)):
        start_first_dma(p, g * tiles_per_prog + p)

    def tile_body(i, _):
        t = g * tiles_per_prog + i
        count = count_ref[t]
        b0, n_blocks = tile_meta(t)

        @pl.when(i + _PREF_DEPTH < tiles_per_prog)
        def _():
            start_first_dma(i + _PREF_DEPTH, t + _PREF_DEPTH)

        tx = (t % grid_x).astype(jnp.float32)
        ty = (t // grid_x).astype(jnp.float32)
        px = tx * TILE_X + qx
        py = ty * TILE_Y + qy

        def get_dma(slot, blk_idx):
            return block_dma(b0, blk_idx, slot)

        row = lambda v: jnp.full((1, TILE_PIXELS), v, jnp.float32)
        init = (
            jnp.zeros((), jnp.int32),  # chunk index
            row(1.0),  # T (last APPLIED transmittance, always >= eps)
            row(1.0),  # alive: sticky termination (forward.cu ``done``)
            row(0.0),  # r
            row(0.0),  # g
            row(0.0),  # b
            row(0.0),  # depth
            row(0.0),  # med_d ACCUMULATOR (default applied at the store)
            row(0.0),  # med_w
            row(0.0),  # med_i
            row(0.0),  # n_contrib
        )

        def cond(state):
            c, alive = state[0], state[2]
            return (c < n_blocks) & (jnp.max(alive) > 0.0)

        def block_math(rows, row_off, get_blk, c, carry):
            """Composite ``rows`` entries at ``row_off`` within block ``c``
            (the math is identical on any (rows, 256) slice of the block,
            so partially-empty boundary slices cost proportionally less
            VPU time). ``get_blk(off, rows)`` yields the (rows, n_rows)
            entry-major table slice."""
            T, alive, r, gg, b, d, md, mw, mi, nc = carry
            sub = subl[:rows]
            blk = get_blk(row_off, rows)

            if packed:
                # in-kernel decode of the packed int32 flat table (see
                # binning_fast packed mode): f16 halves via shift+rescale,
                # f32 rows via bitcast. Means are TILE-RELATIVE (dx =
                # mx - 16*tx), so the pixel delta needs only the local
                # (qx, qy) — no absolute coordinate reconstruction.
                bcf = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
                dxr = _half_lo(blk[:, 0:1])
                dyr = _half_hi(blk[:, 0:1])
                ca = _half_lo(blk[:, 1:2]) * _CONIC_INV
                cb = _half_hi(blk[:, 1:2]) * _CONIC_INV
                if _PACK_RGB10:
                    # rows: 2:(cc*2^14, op) f16 pair 3:rgb10 4:depth
                    # 5:gid — 10-bit fixed-point channels in [0, 4]
                    cc = _half_lo(blk[:, 2:3]) * _CONIC_INV
                    op = _half_hi(blk[:, 2:3])
                    rgb = blk[:, 3:4]
                    col_r = (rgb & 1023).astype(jnp.float32) * _RGB10_INV
                    col_g = ((rgb >> 10) & 1023).astype(jnp.float32) * _RGB10_INV
                    col_b = ((rgb >> 20) & 1023).astype(jnp.float32) * _RGB10_INV
                    dep = bcf(blk[:, 4:5])
                    gid = bcf(blk[:, 5:6])
                else:
                    cc = bcf(blk[:, 2:3])
                    col_r = _half_lo(blk[:, 3:4])
                    col_g = _half_hi(blk[:, 3:4])
                    col_b = _half_lo(blk[:, 4:5])
                    op = _half_hi(blk[:, 4:5])
                    dep = bcf(blk[:, 5:6])
                    gid = bcf(blk[:, 6:7])
                dx = dxr - qx  # (rows, 256): entries x pixels
                dy = dyr - qy
                # expanded quadratic: the "fewer-FMA" Horner-ish factoring
                # -(dx*(0.5ca*dx + cb*dy) + 0.5cc*dy^2) measured SLOWER
                # on-chip (79.7 vs 80.8 — Mosaic schedules the expanded
                # form better); see docs/runs/r5_sweep.md
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            else:
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
                gid = blk[:, 10:11]
                vld = blk[:, 11:12]

                if COMP_DOT3:
                    power = _power_dot3(mx - tx * TILE_X, my - ty * TILE_Y,
                                        ca, cb, cc, G_basis)
                else:
                    dx = mx - px  # (rows, 256): entries x pixels
                    dy = my - py
                    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            # position within the (aligned) tile run
            pos = c * BLOCK + row_off + sub
            # dead-entry masking folded INTO the exp argument: exp(-1e4)
            # underflows to exactly 0 in f32, so pushed-out entries get
            # alpha = 0 without a separate select. Masks:
            #   * power > 0 (outside the ellipse, forward.cu:335);
            #   * aligned mode: realign zeroes padding rows (vld = 0);
            #   * flat mode: every entry inside a tile's run is valid by
            #     construction (culled entries sort after all real tiles),
            #     and rows past the run's end hold the NEXT tile's entries,
            #     so the (rows, 1) count mask replaces the valid row
            if flat_mode or packed:
                invalid_row = pos >= count  # (rows, 1) — broadcast is free
            else:
                invalid_row = vld < 0.5
            Ge = jnp.exp(jnp.where((power > 0.0) | invalid_row, -1e4, power))
            alpha = jnp.minimum(_ALPHA_MAX, op * Ge)
            # sub-threshold contributions are skipped (forward.cu:341)
            alpha = jnp.where(alpha < _ALPHA_MIN, 0.0, alpha)

            # sublane-axis (entry-axis) inclusive prefix product
            cum = 1.0 - alpha
            if _PFX2 and rows >= 32:
                # two-level scan with a NARROW middle: 3 group-local
                # Hillis-Steele steps (masked at 8-row group boundaries),
                # then the cross-group exclusive scan runs on the (rows/8,
                # 256) group-totals array — 1/8 the vregs of the full-width
                # steps 8..rows/2 it replaces — and broadcasts back via
                # sublane repeat.
                for sft in (1, 2, 4):
                    shifted = pltpu.roll(cum, sft, axis=0)
                    shifted = jnp.where(sub % 8 < sft, 1.0, shifted)
                    cum = cum * shifted
                g = cum.reshape(rows // 8, 8, TILE_PIXELS)[:, 7, :]
                subg = jax.lax.broadcasted_iota(
                    jnp.int32, (rows // 8, 1), 0)
                sft = 1
                while sft < rows // 8:
                    sh = pltpu.roll(g, sft, axis=0)
                    g = g * jnp.where(subg < sft, 1.0, sh)
                    sft *= 2
                # exclusive group offsets, broadcast 8x down the sublanes
                excg = jnp.where(subg < 1, 1.0, pltpu.roll(g, 1, axis=0))
                cum = cum * pltpu.repeat(
                    excg.reshape(rows // 8, 1, TILE_PIXELS), 8, axis=1
                ).reshape(rows, TILE_PIXELS)
            else:
                sft = 1
                while sft < rows:
                    shifted = pltpu.roll(cum, sft, axis=0)
                    shifted = jnp.where(sub < sft, 1.0, shifted)
                    cum = cum * shifted
                    sft *= 2

            # exclusive prefix = inclusive rolled down one entry (row 0
            # reads 1): two cheap vector ops replace the (rows, 256)
            # divide P_incl/(1-alpha) of the direct formulation
            exc = jnp.where(sub < 1, 1.0, pltpu.roll(cum, 1, axis=0))
            P_incl = T * cum
            P_excl = T * exc
            # sticky termination (forward.cu:361-365): once the RAW
            # cumulative product crosses eps the pixel never composites
            # again. T carries the last applied value (>= eps), so gating
            # on P_incl alone would resurrect the pixel at every block
            # boundary — and the backward, which trusts n_contrib, would
            # reconstruct 1/(1-alpha) factors for entries the forward
            # skipped while dead (the at-scale training grad blow-up).
            applied = (P_incl >= _TERM_EPS) & (alive > 0.0)
            # NOT P_excl - P_incl: the prefix tree associates cum_i and
            # exc_i differently, so dead rows (alpha = 0) round to +-1 ulp
            # instead of exactly 0 — which poisons the w>0 n_contrib count
            w = jnp.where(applied, alpha * P_excl, 0.0)

            r = r + jnp.sum(w * col_r, axis=0, keepdims=True)
            gg = gg + jnp.sum(w * col_g, axis=0, keepdims=True)
            b = b + jnp.sum(w * col_b, axis=0, keepdims=True)
            d = d + jnp.sum(w * dep, axis=0, keepdims=True)

            # P_incl is monotone non-increasing down the block, so the
            # end-of-block raw product is its LAST ROW — a static (1, 256)
            # slice instead of a tree min-reduction (uses the pre-update T)
            alive = alive * (T * cum[rows - 1:rows, :]
                             >= _TERM_EPS).astype(jnp.float32)
            T = jnp.minimum(
                T, jnp.min(jnp.where(applied, P_incl, jnp.inf), axis=0, keepdims=True)
            )

            if with_median:
                # median-depth trio (the 0.5-crossing entry): the crossing
                # is UNIQUE across the whole front-to-back walk (the
                # applied P chain is monotone), so plain accumulation
                # replaces the any-reduction + crossed-selects; the
                # "never crossed" default is applied once at the store
                # the alpha > 0 term is NOT redundant: for dead rows the
                # prefix tree associates cum_i and exc_i differently (see
                # the w note above), so when the chain straddles 0.5
                # within a ulp a dead row could read P_excl > 0.5 >
                # P_incl and double-accumulate the trio
                cross = (applied & (alpha > 0.0)
                         & (P_excl > 0.5) & (P_incl < 0.5))
                md = md + jnp.sum(jnp.where(cross, dep, 0.0), 0, keepdims=True)
                mw = mw + jnp.sum(jnp.where(cross, w, 0.0), 0, keepdims=True)
                mi = mi + jnp.sum(jnp.where(cross, gid, 0.0), 0, keepdims=True)

            if with_nc:
                # n_contrib feeds ONLY the nc-trusting backward walk; the
                # reference wrapper never returns it to callers
                # (rasterize_points.cu keeps it in the image state) — so
                # inference skips the compare + select + max reduction
                pos1 = (pos + 1).astype(jnp.float32)
                nc = jnp.maximum(
                    nc, jnp.max(jnp.where(w > 0.0, pos1, 0.0), 0,
                                keepdims=True))

            return (T, alive, r, gg, b, d, md, mw, mi, nc)

        def body(state):
            c = state[0]
            carry = state[1:]
            # first block was prefetched into a rotating slot tiles ahead
            slot = jnp.where(c == 0, 2 + i % n_pref, c % 2)

            @pl.when(c + 1 < n_blocks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()

            if flat_mode:
                # roll the 512-lane window so the run's block starts at
                # lane 0 (the in-kernel equivalent of the realign pass);
                # hoisted out of the sub-block loop — one window roll per
                # 256-entry block
                if _NOROLL:
                    # TIMING-ONLY hack (wrong image): skip the dynamic roll
                    # to measure its cost share. Never a production mode.
                    rolled = scratch[slot]
                else:
                    off = b0 + c * BLOCK - flat_anchor(b0, c)
                    rolled = pltpu.roll(
                        scratch[slot], (_FLAT_WIN - off) % _FLAT_WIN, axis=1
                    )
                get_blk = lambda o, rows: rolled[:, o:o + rows].T
            else:
                get_blk = lambda o, rows: scratch[slot][:, o:o + rows].T

            rem = count - c * BLOCK
            if _SUBBLK:
                # sub-block early termination: each SUBBLK-entry slice is
                # skipped once past the tile's count or once every pixel
                # has terminated — the first slice always runs (the while
                # cond guarantees rem > 0 and alive > 0 here)
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
                # r3 path: rem <= BLOCK only ever holds for a tile's LAST
                # block; the quarter/half instances run the same math on a
                # (64|128, 256) workload, so sparse boundary blocks cost
                # proportionally less
                def leaf(width, a):
                    if _SB_SL and width > _SB_SL:
                        # straight-line sub-block decomposition: the
                        # log2(w) roll chain on (w, 256) costs ~w/BLOCK of
                        # the full-block chain, so k slices of width w pay
                        # k*log2(w)*(w/BLOCK) roll-equivalents vs log2(kw)
                        # — 25% less prefix work at w=64, and unlike
                        # GS_SUBBLK there is NO per-slice lax.cond
                        for off in range(0, width, _SB_SL):
                            a = block_math(_SB_SL, off, get_blk, c, a)
                        return a
                    return block_math(width, 0, get_blk, c, a)

                if _LEAF_POLICY == 2:
                    # no boundary specialization: full-width masked math
                    carry = leaf(BLOCK, carry)
                elif _LEAF_POLICY == 1:
                    # single-level cond: half/full instances only
                    carry = jax.lax.cond(
                        rem <= BLOCK // 2,
                        lambda a: leaf(BLOCK // 2, a),
                        lambda a: leaf(BLOCK, a),
                        carry,
                    )
                else:
                    carry = jax.lax.cond(
                        rem <= BLOCK // 4,
                        lambda args: leaf(BLOCK // 4, args),
                        lambda args: jax.lax.cond(
                            rem <= BLOCK // 2,
                            lambda a: leaf(BLOCK // 2, a),
                            lambda a: leaf(BLOCK, a),
                            args,
                        ),
                        carry,
                    )
            return (c + 1,) + carry

        state = jax.lax.while_loop(cond, body, init)
        c_fin, T, _alive, r, gg, b, d, md, mw, mi, nc = state

        # early T-saturation exit leaves the block-(c_fin) prefetch in
        # flight; drain it so its semaphore signal cannot be mistaken for a
        # later tile's copy into the same slot
        @pl.when((c_fin > 0) & (c_fin < n_blocks))
        def _():
            get_dma(c_fin % 2, c_fin).wait()

        # md carried as an accumulator; the never-crossed default applies
        # once here instead of per-block
        md = jnp.where(mw > 0.0, md, _MEDIAN_DEFAULT)
        # one (num_out, 256) store: 9 state rows (+ pad rows when num_out>9)
        # or the 8 live inference rows when nc is skipped (num_out == 8)
        if _OUT8_PROBE:
            # TIMING-ONLY probe (drops nc): writes one aligned 8-sublane
            # tile to measure the output-write cost share. Never production.
            out_ref[i, 0:8] = jnp.concatenate(
                [r, gg, b, d, md, mw, mi, T], axis=0)
        elif num_out == 8:
            assert not with_nc
            out_ref[i] = jnp.concatenate([r, gg, b, d, md, mw, mi, T], axis=0)
        else:
            rows_out = [r, gg, b, d, md, mw, mi, T, nc]
            if num_out > 9:
                rows_out.append(
                    jnp.zeros((num_out - 9, TILE_PIXELS), jnp.float32))
            out_ref[i] = jnp.concatenate(rows_out, axis=0)
        return 0

    if _TPP_UNROLL:
        for i in range(tiles_per_prog):
            tile_body(i, 0)
    else:
        jax.lax.fori_loop(0, tiles_per_prog, tile_body, 0)


# 8 tiles/program measured best on v5e (r3 sweep: 8 > 4 > 16 > 2 > 1)
_TPP_DEFAULT = int(__import__("os").environ.get("GS_TILES_PER_PROG", "8"))

# Sub-block width for intra-block early termination (0 — the default —
# keeps the quarter-instance tail path). Each 256-entry block runs as
# BLOCK//SUBBLK lax.cond-guarded sub-blocks: saturated pixels stop paying
# full-block math at SUBBLK-entry granularity and boundary blocks mask at
# most SUBBLK-1 rows. Measured on the 1080p/300k headline scene the cond
# machinery LOSES to the quarter-instance path (r4 sweep: 0 -> 77.3
# MPix/s, 128 -> 75.9, 64 -> 65.5, 32 -> 51.0): the per-sub-block branch
# overhead exceeds what early termination saves at ~240 entries/tile.
# Kept as an env knob for heavily-saturated scenes.
_SUBBLK = int(__import__("os").environ.get("GS_SUBBLK", "0"))
# timing-only: skip the flat-mode window roll (WRONG image — cost probe)
_NOROLL = __import__("os").environ.get("GS_FLAT_NOROLL", "0") == "1"
# timing-only: 8-row partial output write (drops nc — cost probe)
_OUT8_PROBE = __import__("os").environ.get("GS_OUT8_PROBE", "0") == "1"
if _NOROLL or _OUT8_PROBE:
    # a stray env var must not silently corrupt production renders: these
    # probes produce KNOWINGLY WRONG images and exist only for kernel
    # cost attribution (docs/runs/r4_sweep.md)
    import warnings

    warnings.warn(
        "GS_FLAT_NOROLL/GS_OUT8_PROBE timing-only probe enabled: rendered "
        "images are INTENTIONALLY WRONG (kernel cost attribution mode)",
        stacklevel=2,
    )
# real 8-row inference output block (with_nc=False only; A/B knob)
_INFER_OUT8 = __import__("os").environ.get("GS_INFER_OUT8", "1") == "1"
# two-level prefix product with a narrow cross-group scan (A/B knob)
_PFX2 = __import__("os").environ.get("GS_PFX2", "0") == "1"
# boundary-block leaf policy: 0 = nested quarter/half/full conds (r3),
# 1 = single half/full cond, 2 = always full-width masked math — isolates
# the per-block lax.cond cost vs the wasted-row cost
_LEAF_POLICY = int(__import__("os").environ.get("GS_LEAF", "0"))
# cross-tile first-block prefetch depth (slots 2..2+max(2, depth+1))
_PREF_DEPTH = int(__import__("os").environ.get("GS_PREF_DEPTH", "1"))
_N_SLOTS = 2 + max(2, _PREF_DEPTH + 1)
# unroll the per-program tile loop (static tiles_per_prog) instead of
# lax.fori_loop — lets Mosaic software-pipeline across tile boundaries
_TPP_UNROLL = __import__("os").environ.get("GS_TPP_UNROLL", "0") == "1"
# Straight-line sub-block width for the r3 quarter-instance path: full
# (and half) block instances run as cond-free width-N slices, trading
# ~25% of the prefix roll-chain work for more instruction issue. 0
# disables (single full-width block_math per instance). On-chip A/B
# (r4 sweep2): 128 -> 77.45 MPix/s vs 0 -> 76.12, 64 -> 70.89.
_SB_SL = int(__import__("os").environ.get("GS_SB_SL", "128"))


def composite_pallas(binned: BinnedBlocks, grid_x: int, grid_y: int,
                     tiles_per_prog: int = _TPP_DEFAULT,
                     with_median: bool = True, use_flat: bool = False,
                     with_nc: bool = True):
    """Run the tile compositor; returns packed [T, 16, 256] tile outputs
    (channel-major, pixels on lanes).

    Each program handles ``tiles_per_prog`` tiles to amortize the fixed
    per-program cost. ``use_flat`` composites straight from the flat
    sorted entry table with an in-kernel roll (inference fast path — no
    realign pass, no aligned-blocks array).
    """
    num_tiles = grid_x * grid_y
    padded = -(-num_tiles // tiles_per_prog) * tiles_per_prog
    pad = padded - num_tiles
    # GS_PACK_ALIGN: binning realigned the packed table into 256-aligned
    # int32 blocks — use aligned block addressing (no in-kernel roll) with
    # the packed in-kernel decode
    packed_aligned = (use_flat and binned.aligned_blocks.size > 0
                      and binned.aligned_blocks.dtype == jnp.int32)
    if packed_aligned:
        use_flat = False
    start = binned.tile_start if use_flat else binned.ablock_start
    ablock_start = jnp.pad(start, (0, pad))
    tile_count = jnp.pad(binned.tile_count, (0, pad))
    k_total = binned.flat_entries.shape[1]
    packed = packed_aligned or (
        use_flat and binned.flat_entries.dtype == jnp.int32)
    win = _FLAT_WIN if use_flat else BLOCK
    n_rows = binned.flat_entries.shape[0] if packed else NUM_ATTRS
    # inference (with_nc=False) has exactly 8 live state rows: an aligned
    # 8-sublane output block halves write traffic vs the padded 16 and
    # avoids the 9-row Mosaic layout stall (docs/runs/r4_sweep.md)
    num_out = 8 if (not with_nc and _INFER_OUT8) else NUM_OUT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(padded // tiles_per_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tiles_per_prog, num_out, TILE_PIXELS), lambda t, f, c: (t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((_N_SLOTS, n_rows, win),
                       jnp.int32 if packed else jnp.float32),
            pltpu.SemaphoreType.DMA((_N_SLOTS,)),
        ],
    )
    kernel = partial(_composite_kernel, grid_x=grid_x,
                     tiles_per_prog=tiles_per_prog, with_median=with_median,
                     flat_mode=use_flat, k_total=k_total, packed=packed,
                     with_nc=with_nc, num_out=num_out)
    data = binned.flat_entries if use_flat else binned.aligned_blocks
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, num_out, TILE_PIXELS), jnp.float32),
        grid_spec=grid_spec,
        # programs are self-contained per tile-group (own DMA chains,
        # disjoint outputs): splittable across cores on multi-core TPU
        # gens (v4/v5p megacore); no-op on single-core v5e
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(ablock_start, tile_count, data)
    return out[:num_tiles]


def rasterize_tiles_fast(pre, grid_x: int, grid_y: int, num_entries: int):
    """preprocess results -> packed tile outputs via fast binning + Pallas."""
    from gaustudio_tpu.ops.binning_fast import bin_gaussians_fast

    binned = bin_gaussians_fast(pre, grid_x, grid_y, num_entries)
    out = composite_pallas(binned, grid_x, grid_y)
    return out, binned


# --- differentiable wrapper: Pallas forward + XLA reverse-walk backward -----

def _packed_to_tilemajor(packed, num_tiles):
    """[T,16,256] kernel output -> CompositeOut-style (T+1)-row arrays."""
    from gaustudio_tpu.ops import rasterize_ref as RR

    pad = lambda x, v=0.0: jnp.concatenate(
        [x, jnp.full((1,) + x.shape[1:], v, x.dtype)], axis=0
    )
    # 8-row inference output drops the nc row (no consumer on
    # need_grads=False paths; see composite_pallas num_out)
    nc = (packed[:, 8, :] if packed.shape[1] > 8
          else jnp.zeros_like(packed[:, 7, :]))
    return RR.CompositeOut(
        color=pad(packed[:, 0:3, :].transpose(0, 2, 1)),
        depth=pad(packed[:, 3, :]),
        median_depth=pad(packed[:, 4, :], rasterize_pallas_median_default()),
        median_weight=pad(packed[:, 5, :]),
        median_id=pad(packed[:, 6, :]),
        final_T=pad(packed[:, 7, :], 1.0),
        n_contrib=pad(nc, 0.0).astype(jnp.int32),
    )


def rasterize_pallas_median_default():
    return _MEDIAN_DEFAULT


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def composite_fast(grid_x, grid_y, chunk, with_median, need_grads, means2d,
                   conic, colors, depths, opacities, bg,
                   binned: BinnedBlocks):
    """Drop-in for rasterize_ref.composite with the Pallas forward.

    ``binned`` must have been built from the same (stop-gradiented)
    preprocess outputs; gradients flow to the explicit array args through
    the XLA reverse-walk backward (rasterize_ref._composite_bwd).
    ``with_median=False`` skips the median-depth trio in-kernel (the
    training loss never reads it); those outputs keep their defaults.
    """
    packed = composite_pallas(binned, grid_x, grid_y, with_median=with_median,
                              use_flat=not need_grads, with_nc=need_grads)
    return _packed_to_tilemajor(packed, grid_x * grid_y)


def _composite_fast_fwd(grid_x, grid_y, chunk, with_median, need_grads,
                        means2d, conic, colors, depths, opacities, bg,
                        binned):
    out = composite_fast(grid_x, grid_y, chunk, with_median, need_grads,
                         means2d, conic, colors, depths, opacities, bg,
                         binned)
    res = (means2d, conic, colors, depths, opacities, bg, binned,
           out.final_T, out.n_contrib)
    return out, res


def _composite_fast_bwd(grid_x, grid_y, chunk, with_median, need_grads, res,
                        ct):
    if not need_grads:
        raise ValueError(
            "differentiating a render built with need_grads=False: the "
            "binning dropped the slot operand the backward reduction needs "
            "(set RasterizeSettings.need_grads=True for training paths)"
        )
    (means2d, conic, colors, depths, opacities, bg, binned,
     final_T, n_contrib) = res

    use_xla_bwd = __import__("os").environ.get("GS_BWD_XLA", "0") == "1"
    if jax.devices()[0].platform != "cpu" and not use_xla_bwd:
        # Pallas reverse-walk kernel + sorted segmented reduction
        from gaustudio_tpu.ops import rasterize_pallas_bwd as BW

        num_tiles = grid_x * grid_y
        # [T, 8, 256]: channel rows, pixels on lanes
        ct_tiles = jnp.concatenate(
            [
                ct.color[:num_tiles].transpose(0, 2, 1),
                ct.depth[:num_tiles][:, None, :],
                (-ct.final_T[:num_tiles])[:, None, :],  # dL/d(1-T) convention
                ct.median_depth[:num_tiles][:, None, :],
                final_T[:num_tiles][:, None, :],
                n_contrib[:num_tiles].astype(jnp.float32)[:, None, :],
            ],
            axis=1,
        )
        grad_blocks = BW.composite_backward_pallas(binned, ct_tiles, bg,
                                                   grid_x, grid_y)
        d_m2, d_conic, d_colors, d_depths, d_opac = BW.reduce_entry_grads(
            grad_blocks, binned, means2d.shape[0]
        )
        return (d_m2, d_conic, d_colors, d_depths, d_opac,
                jnp.zeros_like(bg), None)

    from gaustudio_tpu.ops import rasterize_ref as RR
    from gaustudio_tpu.ops.binning_fast import compat_arrays

    gid, tile, valid, tile_start = compat_arrays(binned, grid_x, grid_y)
    ref_res = (means2d, conic, colors, depths, opacities, bg, gid, tile,
               valid, tile_start, final_T, n_contrib)
    grads = RR._composite_bwd(grid_x, grid_y, chunk, ref_res, ct)
    return grads[:6] + (None,)


composite_fast.defvjp(_composite_fast_fwd, _composite_fast_bwd)
