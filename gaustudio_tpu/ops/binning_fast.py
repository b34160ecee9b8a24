"""Fast TPU binning: scatter/cumsum expansion + block-aligned entry layout.

Replaces binning.bin_gaussians' searchsorted/gather pipeline (which hits
XLA-TPU's slow gather lowering: ~600ms searchsorted + ~300ms gathers at
1080p) with bandwidth-friendly primitives only:

  1. entry slots are allocated IN PREPROCESS ORDER (no gaussian-level
     sort): every gaussian owns >= 1 slot (zero-tile/culled ones get a
     single valid=0 slot) so the expand window invariant holds;
  2. per-256-slot-block window anchors come from a Pallas boundary scan
     over ceil(starts/256) (no searchsorted, no K-sized scatter);
  3. a *fused expand* Pallas kernel recovers the slot->gaussian map from
     the starts row (owner one-hots are differences of adjacent step
     functions), selects per-slot attributes with an MXU one-hot matmul
     over each block's contiguous <=384-lane table window (no random
     gather), computes each entry's tile id, and applies the exact
     ellipse/tile cull — all in one pass over [16, K];
  4. one 2-key (tile, depth) sort carries the attribute rows as payload
     operands (XLA variadic sort is bandwidth-efficient; random scatters are
     ~10x slower on TPU), yielding a contiguous (tile, depth)-ordered entry
     stream realigned to 256-aligned per-tile runs [NB_AL, 16, 256].
     Depth ordering comes from the second sort key — the old design's
     16-operand compact-by-depth gaussian sort bought only single-key
     stability and was pure overhead.

Entry attribute rows: 0:mx 1:my 2:conic_a 3:conic_b 4:conic_c 5:opacity
6:r 7:g 8:b 9:depth 10:gaussian_id 11:valid 12:slot 13-15:pad.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaustudio_tpu.ops.gaussian import Preprocessed

BLOCK = 256  # entries per block == compositor chunk == alignment
NUM_ATTRS = 16


class BinnedBlocks(NamedTuple):
    flat_entries: jnp.ndarray  # [16, K] f32 attr-major tile-sorted entries
    aligned_blocks: jnp.ndarray  # [NB_AL, 16, BLOCK] 256-aligned tile runs
    tile_start: jnp.ndarray  # [T] int32 first flat entry of each tile
    tile_count: jnp.ndarray  # [T] int32 real entries per tile
    ablock_start: jnp.ndarray  # [T] int32 first ALIGNED block of each tile
    sorted_tile: jnp.ndarray  # [K] int32 tile id per sorted entry (backward)
    num_rendered: jnp.ndarray  # [] int32
    slot_gauss: jnp.ndarray  # [K] int32 slot -> compact gaussian (monotone)
    compact_gid: jnp.ndarray  # [N] int32 compact order -> original gaussian


def _blocked_cumsum(x):
    """Exclusive cumsum via two-level lower-triangular matmuls (MXU) —
    avoids any data-dependent op; exact in f32 for counts < 2^24."""
    B = 512
    n = x.shape[0]
    pad = (-n) % B
    xp = jnp.pad(x.astype(jnp.float32), (0, pad))
    xb = xp.reshape(-1, B)
    tril = jnp.tril(jnp.ones((B, B), jnp.float32), -1)  # strictly lower
    # HIGHEST: counts > 256 would round in the default-bf16 MXU passes
    inner = jax.lax.dot_general(
        xb, tril.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    block_tot = inner[:, -1] + xb[:, -1]
    carry = jnp.concatenate([jnp.zeros(1), jnp.cumsum(block_tot)[:-1]])
    return (inner + carry[:, None]).reshape(-1)[:n]


# --- fused run-expand gather (Pallas) ---------------------------------------

_SUPER = 8  # slot-blocks handled per expand program (for tiling-legal specs)
_EXP_F = 16  # attr rows in the expand table (and output columns)
_EXP_ROWS = 24  # sublane-padded table height
# window lanes: 8 blocks x 256 max-distinct gaussians + 128 alignment slack,
# rounded to a lane-tile multiple
_WIN = _SUPER * BLOCK + 2 * 128


def expand_table(rows, height: int = _EXP_ROWS):
    """Stack 1D per-gaussian f32 arrays into the lane-padded [height, Npad]
    attr-major table the expand kernel consumes (height: multiple of 8)."""
    n = rows[0].shape[0]
    npad = (-(n) // 128) * -128 + _WIN
    table = jnp.stack(rows, axis=0)
    table = jnp.pad(table, ((0, height - len(rows)), (0, npad - n)))
    return table


# --- fused expand: slotmap + attribute select + tile id + exact cull --------
#
# One Pallas pass replaces four XLA stages of the original pipeline
# (marker scatter + second blocked cumsum for the slot->gaussian map;
# per-slot j/tile integer math; the exact ellipse/tile cull), all of which
# paid HBM round-trips over [K]-sized arrays (~10ms at 1080p). The
# slot->gaussian map is recovered IN-KERNEL from the `starts` row: owner
# one-hots are differences of adjacent step functions,
#   onehot[q, j] = [starts_j <= s_q] - [starts_{j+1} <= s_q],
# so the (256, 384) compare matrix needs no transposes and no cumsums, and
# the same NT matmul that selects attributes also yields the owner index
# (an iota table row selected like any other attribute).
#
# Table rows (built by bin_gaussians_fast): 0:mx 1:my 2-4:conic 5:opac
# 6-8:rgb 9:depth 10:gid 11:valid 12:starts 13:x0 14:y0 15:rect_w
# 16:iota(compact index). Output rows (attr-major [16, K]): 0-10 the sort
# payload attrs, 11:valid(after cull) 12:g(compact owner) 13:tile 14-15 pad.

_FE_ROWS = 16  # fused-expand output rows (vanilla layout)

# One-hot select matmul mode. False: single f32 dot at Precision.HIGHEST
# (6 bf16 MXU passes). True: decompose the data operand into 3 exact-sum
# bf16 planes and issue 3 native bf16 dots — half the MXU passes; the
# one-hot operand is exactly bf16-representable, and integer-valued rows
# are re-rounded after the select (plane-sum residual < 2^-24·|x| < 0.5
# for table indices < 2^24). Flip only with on-chip parity
# (tools/tpu_parity_check.py) re-verified.
# Default ON since round 3: on-chip parity + grad parity clean, +3.8%
# headline (docs/runs/r3_sweep.md). GS_SELECT_DOT3=0 restores HIGHEST f32.
SELECT_DOT3 = __import__("os").environ.get("GS_SELECT_DOT3", "1") == "1"

# Inference-path f16 payload packing (two sort operands fewer; ~2^-12
# relative color rounding, invisible at 8-bit output). GS_PACK_F16=0
# restores bit-exact payloads.
PACK_F16 = __import__("os").environ.get("GS_PACK_F16", "1") == "1"

# Inference-path GEOMETRY packing (two more operands fewer): means are
# stored TILE-RELATIVE (dx = mx - 16*tx, so f16's 11-bit mantissa gives
# sub-0.01px steps for small splats and <=1px only where sigma is huge
# and alpha varies slowly) and (conic_a, conic_b) ride one operand scaled
# by 2^14 (conic range [1e-6, 3.4] maps into f16 normals). Bounded alpha
# error ~ |power| * 2^-11 < 0.6%; image parity stays within the 8-bit
# tolerance (tools/tpu_parity_check.py gates the default).
PACK_GEO = __import__("os").environ.get("GS_PACK_GEO", "1") == "1"
_CONIC_SCALE = 16384.0  # 2^14
_DXY_CLAMP = 32768.0  # beyond this alpha is provably < 1/255; avoids f16 inf

# Inference-path r4 packing (both on top of GS_PACK_GEO):
#   GS_PACK_RGB10: colors ride ONE int32 as 10-bit fixed-point channels in
#     [0, 4] (SH colors are clamped at 0 but not 1 — forward.cu:70 only
#     clamps negatives; 4 covers any sane radiance) and opacity pairs with
#     conic_c — 4 payload operands instead of 5. Quantization error
#     <= 2e-3 per channel, inside the 8-bit output quantum and the 5e-3
#     parity gate.
#   GS_PACK_KEY1: (tile, depth) fuse into ONE uint32 sort key — tile in
#     the top 13 bits, the top 19 bits of the positive-f32 depth pattern
#     (monotone in depth) below. Depth order within a tile is exact down
#     to 2^-11 relative; nearer ties sort arbitrarily (the CUDA fork's
#     64-bit key has the same structure with 32 depth bits,
#     rasterizer_impl.cu:98-109). The depth attribute is reconstructed
#     mid-quantum (2^-12 relative, far inside the 5e-2 depth gate).
#     Auto-falls back to the 2-key sort when num_tiles >= 8192.
PACK_RGB10 = __import__("os").environ.get("GS_PACK_RGB10", "1") == "1"
PACK_KEY1 = __import__("os").environ.get("GS_PACK_KEY1", "1") == "1"
#   GS_PACK_ALIGN: realign the PACKED int32 table into 256-aligned tile
#     runs (the realign pass costs one streamed HBM round trip over the
#     half-width packed table) so the flat compositor's per-block dynamic
#     pltpu.roll — a log-decomposed lane shuffle on every (8, 512) window
#     — disappears: blocks DMA directly at aligned offsets. MEASURED
#     SLOWER at the 1080p/300k headline (r4 sweep4: 76.86 vs 79.0
#     MPix/s): the extra realign pass costs more than the in-kernel roll
#     it removes. Kept as a knob for workloads with many blocks per tile
#     (deep scenes), where the roll count grows but the realign does not.
PACK_ALIGN = __import__("os").environ.get("GS_PACK_ALIGN", "0") == "1"
_RGB10_SCALE = 1023.0 / 4.0
_DEPTH_Q_SHIFT = 12  # f32 bits dropped by the 19-bit depth key


def _pack2_f16(lo, hi):
    """Pack two f32 rows into one int32 row as (hi<<16)|lo f16 bit pairs.

    Used to halve sort payload operands on inference paths; the int32
    carrier (rather than a bitcast f32) keeps arbitrary bit patterns safe
    from any float canonicalization between sort stages.
    """
    lo16 = jax.lax.bitcast_convert_type(
        lo.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    hi16 = jax.lax.bitcast_convert_type(
        hi.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo16 | (hi16 << 16), jnp.int32)


def _unpack2_f16(packed):
    """Inverse of :func:`_pack2_f16` -> (lo_f32, hi_f32)."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16)
    hi = jax.lax.bitcast_convert_type(
        (u >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _onehot_select(sl, onehot, n_int_from: int | None = None):
    """(rows, L) data × (256, L) one-hot -> (rows, 256) selected columns.

    ``n_int_from``: first row holding integer-valued data (rounded back to
    exact integers in dot3 mode); None = no integer rows.
    """
    if not SELECT_DOT3:
        return jax.lax.dot_general(
            sl, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    oh = onehot.astype(jnp.bfloat16)
    hi = sl.astype(jnp.bfloat16)
    r1 = sl - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda a: jax.lax.dot_general(
        a, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sel = dot(hi) + dot(mid) + dot(lo)
    if n_int_from is not None:
        sel = jnp.concatenate(
            [sel[:n_int_from], jnp.round(sel[n_int_from:])], axis=0
        )
    return sel


def _fused_expand_kernel(blk_lo_ref, meta_ref, data_hbm, out_ref, win, sems,
                         *, grid_x: int, num_tiles: int, n_gauss: int,
                         n_sel: int = 11, starts_row: int = 12,
                         rect_rows: tuple = (13, 14, 15),
                         valid_row: int = 11, iota_row: int = 16,
                         out_rows: int = _FE_ROWS, cull: bool = True):
    sb = pl.program_id(0)
    nprog = pl.num_programs(0)

    def window_dma(p, slot):
        aligned_p = (blk_lo_ref[p * _SUPER] // 128) * 128
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(aligned_p, _WIN)], win.at[slot],
            sems.at[slot],
        )

    @pl.when(sb == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(sb + 1 < nprog)
    def _():
        window_dma(sb + 1, (sb + 1) % 2).start()

    slot = sb % 2
    window_dma(sb, slot).wait()

    base_blk = sb * _SUPER
    a128 = blk_lo_ref[base_blk] // 128
    total = meta_ref[0]

    lane384 = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * 128), 1)
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    sub256 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)

    for b in range(_SUPER):
        lo_b = blk_lo_ref[base_blk + b]
        off_hi = jnp.minimum(lo_b // 128 - a128, (_WIN - 3 * 128) // 128) * 128
        sl = win[slot, :, pl.ds(off_hi, 3 * 128)]  # (rows, 384)
        s0 = (a128 + off_hi // 128) * 128  # table index of slice lane 0
        s_base = (sb * _SUPER + b) * BLOCK  # first slot of this block

        # owner one-hot via step-function differences. Lane-padding rows
        # (table index >= n_gauss) carry starts == 0 and must read as
        # "never starts" -> +inf.
        starts = jnp.where(
            s0 + lane384 < n_gauss, sl[starts_row:starts_row + 1, :], 3.4e38
        )
        # starts_{j+1} at lane j (lane 383 wraps; it never owns a block
        # slot — owners sit < s0+383 — so its one-hot must only read 0,
        # which the `cmp` floor below guarantees)
        starts_nxt = jnp.where(
            lane384 == 3 * 128 - 1, 3.4e38,
            pltpu.roll(starts, 3 * 128 - 1, axis=1),
        )
        # cmp[q, j] = [starts_j <= s_q]; slots on sublanes, table on lanes
        base_f = jnp.float32(s_base)
        cmp = (starts - base_f <= sub256).astype(jnp.float32)
        nxt = (starts_nxt - base_f <= sub256).astype(jnp.float32)
        onehot = cmp - jnp.minimum(cmp, nxt)
        # NT matmul: contract both lane dims -> (rows, 256) selected attrs.
        # Exactness is load-bearing (default single-pass bf16 MXU would
        # corrupt starts/iota at 2^20 scale): HIGHEST f32, or the 3-plane
        # bf16 decomposition with integer rows re-rounded (gid onward —
        # gid/valid/starts/x0/y0/rw/iota are all integer-valued).
        sel = _onehot_select(sl, onehot, n_int_from=n_sel - 1)

        # per-slot scalar math, lane-dense (1, 256) rows
        s_row = (s_base + lane256).astype(jnp.float32)
        starts_sel = sel[starts_row:starts_row + 1, :]
        x0 = sel[rect_rows[0]:rect_rows[0] + 1, :]
        y0 = sel[rect_rows[1]:rect_rows[1] + 1, :]
        rw = jnp.maximum(sel[rect_rows[2]:rect_rows[2] + 1, :], 1.0)
        j = s_row - starts_sel
        # exact f32 division + integer correction (operands < 2^21)
        q = jnp.floor(j / rw)
        r = j - q * rw
        q = q + (r >= rw).astype(jnp.float32) - (r < 0).astype(jnp.float32)
        r = j - q * rw
        tx = x0 + r
        ty = y0 + q
        tile = ty * jnp.float32(grid_x) + tx

        valid = (sel[valid_row:valid_row + 1, :] > 0.5) & (
            s_row < total.astype(jnp.float32)
        )
        if cull:
            valid = valid & _tile_max_alpha_keep(
                sel[0:1, :], sel[1:2, :], sel[2:3, :], sel[3:4, :],
                sel[4:5, :], sel[5:6, :], tx, ty,
            )
        tile = jnp.where(valid, tile, jnp.float32(num_tiles))

        out = jnp.concatenate(
            [
                sel[0:n_sel, :],
                valid.astype(jnp.float32),
                sel[iota_row:iota_row + 1, :],  # g: selected iota row
                tile,
                jnp.zeros((out_rows - n_sel - 3, BLOCK), jnp.float32),
            ],
            axis=0,
        )
        out_ref[:, pl.ds(b * BLOCK, BLOCK)] = out


def fused_expand(table, block_lo, total, grid_x: int, num_tiles: int,
                 n_gauss: int, num_slots: int, **layout):
    """Fused slotmap/select/tile/cull pass -> [out_rows, K] attr-major
    entries. ``layout`` overrides the vanilla table/output row indices
    (see _fused_expand_kernel) — the surfel pipeline passes its own."""
    K = num_slots
    nb = K // BLOCK
    rows = table.shape[0]
    out_rows = layout.get("out_rows", _FE_ROWS)
    assert nb % _SUPER == 0
    assert rows % 8 == 0 and table.shape[1] % 128 == 0
    meta = jnp.reshape(total.astype(jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb // _SUPER,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (out_rows, _SUPER * BLOCK), lambda p, lo, m: (0, p)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, _WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_fused_expand_kernel, grid_x=grid_x, num_tiles=num_tiles,
                n_gauss=n_gauss, **layout),
        out_shape=jax.ShapeDtypeStruct((out_rows, K), jnp.float32),
        grid_spec=grid_spec,
    )(block_lo, meta, table)


def block_lo_from_starts(starts, num_slots: int):
    """Per-256-block window anchors block_lo[b] = owner of slot 256*b,
    via the Pallas boundary scan over ceil(starts/256) (no K-sized
    scatter/cumsum)."""
    nb = num_slots // BLOCK
    blk_key = (starts + BLOCK - 1) // BLOCK  # monotone int32
    return jnp.maximum(tile_ranges(blk_key, nb)[1:] - 1, 0)




# --- 256-aligned run realignment (Pallas) ------------------------------------
#
# The compositors walk each tile's entry run in 256-entry blocks. With runs
# at arbitrary offsets every tile pays ~0.64 extra boundary blocks of full
# block math (~2.4 us each), and backward grad blocks shared by adjacent
# tiles force serialized read-modify-write DMA. Realigning every tile's run
# to a 256-multiple start removes both: at 1080p/1.35M visible entries this
# cuts block-iterations from ~13.4k to ~8.7k.

_RA_SUPER = 8  # dest blocks per realign program
# src_lo is monotone with steps <= 256 per dest block, so 8 dest blocks are
# covered by one window of 8*256 lanes + 128 alignment slack + 128 rounding
_RA_WIN = _RA_SUPER * BLOCK + 2 * 128


def _realign_kernel(srclo_ref, vcnt_ref, flat_hbm, out_ref, win, sems, *,
                    k_total: int, n_rows: int = NUM_ATTRS):
    p = pl.program_id(0)
    nprog = pl.num_programs(0)

    def window_dma(q, slot):
        lo = srclo_ref[q * _RA_SUPER]
        # multiply-last so Mosaic can prove the lane offset is 128-aligned
        al = jnp.minimum(lo // 128, (k_total - _RA_WIN) // 128) * 128
        return pltpu.make_async_copy(
            flat_hbm.at[:, pl.ds(al, _RA_WIN)], win.at[slot], sems.at[slot]
        )

    @pl.when(p == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(p + 1 < nprog)
    def _():
        window_dma(p + 1, (p + 1) % 2).start()

    window_dma(p, p % 2).wait()

    a128 = jnp.minimum(srclo_ref[p * _RA_SUPER] // 128,
                       (k_total - _RA_WIN) // 128)
    slot = p % 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, BLOCK), 1)
    for b in range(_RA_SUPER):
        lo_b = srclo_ref[p * _RA_SUPER + b]
        # 128-aligned 384-lane VMEM sub-slice + small roll for the sub-128
        # offset — the old full-window pltpu.roll shuffled ~147KB per block
        off_hi = jnp.minimum(lo_b // 128 - a128,
                             (_RA_WIN - 3 * 128) // 128) * 128
        sl = win[slot, :, pl.ds(off_hi, 3 * 128)]
        off_lo = lo_b - (a128 + off_hi // 128) * 128
        blk = pltpu.roll(sl, (3 * 128 - off_lo) % (3 * 128), axis=1)[:, :BLOCK]
        vcnt = vcnt_ref[p * _RA_SUPER + b]
        out_ref[0, b] = jnp.where(lane < vcnt, blk,
                                  jnp.zeros((), blk.dtype))


def realign_runs(flat_entries, src_lo, vcnt, nb_al: int):
    """Gather [n_rows, K] flat tile-sorted entries into 256-aligned
    per-tile blocks [nb_al, n_rows, BLOCK] (n_rows a multiple of 8; the
    vanilla layout uses 16 with 'valid' at row 11); rows beyond a tile's
    real count are zeroed, so the valid row reads 0 on padding."""
    n_rows, K = flat_entries.shape
    dtype = flat_entries.dtype
    assert n_rows % 8 == 0
    assert nb_al % _RA_SUPER == 0
    assert K >= _RA_WIN, "num_entries must cover one realign window"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_al // _RA_SUPER,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _RA_SUPER, n_rows, BLOCK), lambda p, s, v: (p, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, _RA_WIN), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_realign_kernel, k_total=K, n_rows=n_rows),
        out_shape=jax.ShapeDtypeStruct(
            (nb_al // _RA_SUPER, _RA_SUPER, n_rows, BLOCK), dtype
        ),
        grid_spec=grid_spec,
    )(src_lo, vcnt, flat_entries)
    return out.reshape(nb_al, n_rows, BLOCK)


# --- tile ranges: Pallas boundary scan over the sorted keys -----------------

_TR_ROWS = 16  # 16 x 128 = 2048 sorted keys per DMA window


def _ranges_kernel(tiles_hbm, out_ref, win, sems, *, n_chunks: int,
                   num_tiles: int, k_total: int):
    """tile_start[t] = #sorted keys < t, via a streaming boundary walk.

    Because the keys are sorted, the walk advances the tile cursor only
    through each chunk's [min, max] span, so total while-iterations are
    ~num_tiles + n_chunks (telescoping) — ~1-2ms at 1080p vs ~6ms for
    XLA searchsorted (the scatter/segment-sum alternatives are ~23ms)."""
    hi = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    lo = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    bucket = hi * 128 + lo
    win_bucket = bucket[:8]  # (8, 128) window view for the per-t write

    def dma(c, slot):
        return pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(c * _TR_ROWS, _TR_ROWS)],
            win.at[slot], sems.at[slot])

    dma(0, 0).start()
    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_body(c, t_cur):
        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, (c + 1) % 2).start()

        dma(c, c % 2).wait()
        t = win[c % 2]
        t_last = jnp.minimum(jnp.max(t), num_tiles)
        base = c * (_TR_ROWS * 128)

        def w_body(tc):
            # all prior chunks' keys are < tc (sorted); count only here.
            # keepdims avoids a scalar round-trip; the write touches one
            # provably-8-aligned sublane window, not the whole histogram.
            cnt = base + jnp.sum((t < tc).astype(jnp.int32), keepdims=True)
            r8 = (tc // 1024) * 8
            w = out_ref[pl.ds(r8, 8), :]
            out_ref[pl.ds(r8, 8), :] = jnp.where(
                win_bucket + r8 * 128 == tc, cnt, w)
            return tc + 1

        return jax.lax.while_loop(lambda tc: tc <= t_last, w_body, t_cur)

    t_cur = jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    # tail: only reachable when every key is a real tile (no cull/pad rows
    # keyed num_tiles); every remaining bucket then starts at k_total
    out_ref[...] = jnp.where(
        (bucket >= t_cur) & (bucket <= num_tiles), k_total, out_ref[...]
    )


def tile_ranges(sort_tile, num_tiles: int):
    """[T+1] int32 positions (== searchsorted(sort_tile, arange(T+1)))."""
    K = sort_tile.shape[0]
    rows = -(-K // 128)
    rows_pad = -(-rows // _TR_ROWS) * _TR_ROWS
    t2d = jnp.pad(
        sort_tile.astype(jnp.int32), (0, rows_pad * 128 - K),
        constant_values=num_tiles,
    ).reshape(rows_pad, 128)
    # rounded up to 8 sublanes: the per-t write touches an 8-row window at
    # r8 = (t // 1024) * 8, which must stay inside the block
    hi_dim = -(-max(8, -(-(num_tiles + 1) // 128)) // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((hi_dim, 128), lambda p: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _TR_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_ranges_kernel, n_chunks=rows_pad // _TR_ROWS,
                num_tiles=num_tiles, k_total=K),
        out_shape=jax.ShapeDtypeStruct((hi_dim, 128), jnp.int32),
        grid_spec=grid_spec,
    )(t2d)
    return out.reshape(-1)[: num_tiles + 1]


_TILE = 16  # pixel tile edge (gaussian.TILE_X)


def _tile_max_alpha_keep(mx, my, a, b, c, op, tx, ty):
    """True iff the entry's max alpha over its 16x16 tile can reach 1/255.

    Maximizes the (negated) quadratic power = -0.5 d^T Q d over the tile's
    pixel box by minimizing d^T Q d: the minimum is either 0 (mean inside
    the box) or attained on one of the four edges, where the 1-D quadratic
    has a closed-form clamped vertex. Pure elementwise jnp math — runs
    identically as an XLA stage or inside the fused expand Pallas kernel.
    """
    x0 = tx.astype(jnp.float32) * _TILE
    x1 = x0 + _TILE - 1
    y0 = ty.astype(jnp.float32) * _TILE
    y1 = y0 + _TILE - 1

    inside = (mx >= x0) & (mx <= x1) & (my >= y0) & (my <= y1)

    # d = mean - pixel; edges in d-space
    dx0 = mx - x1  # pixel at x1 -> smallest dx
    dx1 = mx - x0
    dy0 = my - y1
    dy1 = my - y0

    big = jnp.float32(3.4e38)
    safe_a = jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
    safe_c = jnp.where(jnp.abs(c) > 1e-12, c, 1e-12)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_y(dy):  # minimize over dx in [dx0, dx1] at fixed dy
        v = jnp.clip(-b * dy / safe_a, dx0, dx1)
        return q(v, dy)

    def edge_x(dx):  # minimize over dy in [dy0, dy1] at fixed dx
        v = jnp.clip(-b * dx / safe_c, dy0, dy1)
        return q(dx, v)

    m = jnp.minimum(
        jnp.minimum(edge_y(dy0), edge_y(dy1)),
        jnp.minimum(edge_x(dx0), edge_x(dx1)),
    )
    min_q = jnp.where(inside, 0.0, m)

    # keep if alpha_max = op * exp(-0.5 * min_q) >= 1/255
    # i.e. min_q <= 2 * ln(255 * op); op <= 1/255 keeps nothing
    thresh = 2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0)
    return (min_q <= thresh) & (op * 255.0 >= 1.0)

def bin_gaussians_fast(pre: Preprocessed, grid_x: int, grid_y: int,
                       num_entries: int, carry_gid: bool = True,
                       carry_slot: bool = True,
                       realign: bool = True) -> BinnedBlocks:
    """Build the block-aligned sorted entry layout (see module docstring)."""
    n = pre.depths.shape[0]
    num_tiles = grid_x * grid_y
    K = num_entries
    assert K % BLOCK == 0

    # 1. slot allocation IN PREPROCESS ORDER. Depth ordering is enforced by
    # the entry sort's second key instead of a gaussian-level compact sort
    # (which carried 16 payload operands at N just to make the tile sort
    # single-key stable — the 2-key sort moves the same bytes, so the
    # compact sort was pure overhead). The fused-expand window invariant
    # (every owner holds >= 1 slot) is kept by allocating one slot even to
    # culled / zero-tile gaussians; their single entry carries valid=0 and
    # sorts to the tail with the num_tiles key.
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    tiles_t = pre.tiles_touched.astype(jnp.int32)
    valid_g = pre.valid & (tiles_t > 0)
    tiles_alloc = jnp.maximum(tiles_t, 1)
    valid_s = valid_g.astype(jnp.float32)
    dep_s = pre.depths
    iota_f = jnp.arange(n, dtype=jnp.float32)

    # 2. entry-slot geometry: exclusive cumsum of per-gaussian slot counts
    # (blocked MXU cumsum: jnp.cumsum at 2.2M costs ~3.2ms on XLA-TPU, the
    # two-level matmul scan ~0.3ms; exact in f32 for counts < 2^24), plus
    # per-256-block window anchors block_lo[b] = (owner of slot 256*b) via
    # the Pallas boundary scan over ceil(starts/256) — NO K-sized marker
    # scatter or second cumsum; the full slot->gaussian map is recovered
    # inside the fused expand kernel from the starts row itself.
    starts = _blocked_cumsum(tiles_alloc).astype(jnp.int32)  # exclusive
    total = starts[-1] + tiles_alloc[-1]
    block_lo = block_lo_from_starts(starts, K)

    # 3. fused expand: one Pallas pass selects per-slot attributes, computes
    # the tile id of every (gaussian, tile) entry, and applies the exact
    # ellipse/tile cull (entries whose max alpha anywhere in the tile is
    # < 1/255 are skipped pixel-by-pixel by the compositor anyway —
    # forward.cu:354 — so dropping them up-front leaves images
    # bit-identical while shrinking per-tile work; the rect is a loose
    # bbox of the 3-sigma *circle*). Table rows: 0:mx 1:my 2-4:conic
    # 5:opac 6-8:rgb 9:depth 10:gid 11:valid 12:start 13:rect_min_x
    # 14:rect_min_y 15:rect_w 16:iota.
    table = expand_table(
        [
            pre.means2d[:, 0], pre.means2d[:, 1],
            pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2],
            pre.opacities,
            pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
            dep_s, iota_f, valid_s,
            starts.astype(jnp.float32),
            pre.rect_min[:, 0].astype(jnp.float32),
            pre.rect_min[:, 1].astype(jnp.float32),
            rect_w.astype(jnp.float32),
            iota_f,
        ]
    )
    expanded_t = fused_expand(table, block_lo, total, grid_x, num_tiles,
                              n, K)  # [16, K] attr-major
    tile = expanded_t[13].astype(jnp.int32)
    g = expanded_t[12].astype(jnp.int32)
    slot = jnp.arange(K, dtype=jnp.int32)

    # 4. one stable sort by tile carrying the 11 used attribute payloads
    # plus the pre-sort slot index (row 12; the backward reduction sorts
    # per-entry gradients back to slot order, where the gaussian map is
    # monotone). Sort cost on TPU scales ~linearly with operand count
    # (~2ms/operand at 2M entries), so the valid flag (derivable from the
    # key: culled entries were keyed num_tiles) and the pad rows are
    # rebuilt after the sort.
    # Sort cost on TPU is ~1.4ms/operand at 2M entries, so optional rows
    # are dropped per-mode: gid (row 10) feeds only the median-id output
    # (carry_gid=False when the caller skips median), slot (row 12) only
    # the backward grad reduction (carry_slot=False on inference paths).
    # Inference additionally PACKS (r,g) and (b,opacity) as f16 pairs
    # carried in single int32 payloads (2 fewer operands; unpacked XLA-side
    # right after the sort). The ~2^-12 relative rounding only perturbs
    # output color by < 2.5e-4 — inference-only because the grad-parity
    # harness holds Pallas vs XLA backward to ~3e-6.
    pack_f16 = PACK_F16 and not carry_slot
    pack_geo = pack_f16 and PACK_GEO
    pack_rgb10 = pack_geo and PACK_RGB10
    # single fused (tile | depth_q) uint32 key: tile needs <= 13 bits
    pack_key1 = pack_rgb10 and PACK_KEY1 and num_tiles < (1 << 13)
    if pack_geo:
        # tile-relative means + scaled conic pairs: culled entries
        # (tile == num_tiles) unpack to garbage attrs but sort to the end
        # and are excluded from every tile range.
        tyf = jnp.floor(expanded_t[13] / jnp.float32(grid_x))
        txf = expanded_t[13] - tyf * grid_x
        dx = jnp.clip(expanded_t[0] - 16.0 * txf, -_DXY_CLAMP, _DXY_CLAMP)
        dy = jnp.clip(expanded_t[1] - 16.0 * tyf, -_DXY_CLAMP, _DXY_CLAMP)
        if pack_rgb10:
            # 4 payload operands: (dx,dy), (ca,cb), (cc,op), rgb10
            q10 = lambda v: jnp.round(
                jnp.clip(v, 0.0, 4.0) * _RGB10_SCALE).astype(jnp.int32)
            rgb10 = q10(expanded_t[6]) | (q10(expanded_t[7]) << 10) | (
                q10(expanded_t[8]) << 20)
            cols = (
                _pack2_f16(dx, dy),
                _pack2_f16(expanded_t[2] * _CONIC_SCALE,
                           expanded_t[3] * _CONIC_SCALE),
                _pack2_f16(expanded_t[4] * _CONIC_SCALE, expanded_t[5]),
                rgb10,
            )
        else:
            cols = (
                _pack2_f16(dx, dy),
                _pack2_f16(expanded_t[2] * _CONIC_SCALE,
                           expanded_t[3] * _CONIC_SCALE),
                expanded_t[4],
                _pack2_f16(expanded_t[6], expanded_t[7]),
                _pack2_f16(expanded_t[8], expanded_t[5]),
            )
    elif pack_f16:
        cols = tuple(expanded_t[a] for a in range(5)) + (
            _pack2_f16(expanded_t[6], expanded_t[7]),
            _pack2_f16(expanded_t[8], expanded_t[5]),
        )
    else:
        cols = tuple(expanded_t[a] for a in range(9))
    n_attr_ops = len(cols)
    if carry_gid:
        cols = cols + (expanded_t[10],)
    if carry_slot:
        cols = cols + (slot.astype(jnp.float32),)
    if pack_key1:
        # ONE uint32 key: tile (13b) | top-19 bits of the positive-f32
        # depth pattern (monotone in depth for the valid z > 0.2 entries;
        # culled rows carry tile == num_tiles and sort to the tail
        # regardless of their depth bits). Within-tile depth order is
        # exact down to 2^-11 relative; nearer ties order arbitrarily.
        dbits = jax.lax.bitcast_convert_type(expanded_t[9], jnp.uint32)
        key = (tile.astype(jnp.uint32) << 19) | (
            (dbits >> _DEPTH_Q_SHIFT) & jnp.uint32(0x7FFFF))
        sorted_ops = jax.lax.sort((key,) + cols, num_keys=1,
                                  is_stable=False)
        sort_tile = (sorted_ops[0] >> 19).astype(jnp.int32)
        # mid-quantum depth reconstruction (2^-12 relative)
        dep_row = jax.lax.bitcast_convert_type(
            ((sorted_ops[0] & jnp.uint32(0x7FFFF)) << _DEPTH_Q_SHIFT)
            | jnp.uint32(1 << (_DEPTH_Q_SHIFT - 1)),
            jnp.float32,
        )
        # re-insert a placeholder in the key slot so payload indices below
        # match the 2-key layout (payloads start at index 2)
        sorted_ops = (sort_tile, dep_row) + sorted_ops[1:]
    else:
        # 2-key (tile, depth) sort: depth order comes from the second key,
        # not from a pre-sorted gaussian order, so depth doubles as the
        # depth attribute row and stability is not load-bearing
        sorted_ops = jax.lax.sort((tile, expanded_t[9]) + cols, num_keys=2,
                                  is_stable=False)
        sort_tile = sorted_ops[0]
        dep_row = sorted_ops[1]
    valid_row = (sort_tile < num_tiles).astype(jnp.float32)
    zero_row = jnp.zeros((K,), jnp.float32)
    if pack_geo and not realign:
        # PACKED FLAT TABLE (inference fast path): the sorted payload
        # operands become the compositor's input table VERBATIM — no
        # post-sort unpack pass, no 16-row f32 stack (both were full HBM
        # round trips over K), and the flat-mode kernel window DMA moves
        # half the bytes. The compositor decodes halves / 10-bit channels
        # in-kernel (shift+scale bitcast tricks).
        # RGB10 rows (int32): 0:(dx,dy) f16 pair (tile-relative means)
        # 1:(ca,cb)*2^14 f16 pair 2:(conic_c*2^14, opacity) f16 pair
        # 3:rgb10 4:depth f32 bits 5:gid f32 bits 6-7:pad.
        # Legacy rows: 0:(dx,dy) 1:(ca,cb)*2^14 2:conic_c f32 bits
        # 3:(r,g) 4:(b,opacity) 5:depth f32 bits 6:gid f32 bits 7:pad.
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        zero_i = jnp.zeros((K,), jnp.int32)
        if pack_rgb10:
            gid_packed = bc(sorted_ops[6]) if carry_gid else zero_i
            flat_entries = jnp.stack(
                [sorted_ops[2], sorted_ops[3], sorted_ops[4],
                 sorted_ops[5], bc(dep_row), gid_packed, zero_i, zero_i],
                axis=0,
            )  # [8, K] int32
        else:
            gid_packed = bc(sorted_ops[7]) if carry_gid else zero_i
            flat_entries = jnp.stack(
                [sorted_ops[2], sorted_ops[3], bc(sorted_ops[4]),
                 sorted_ops[5], sorted_ops[6], bc(dep_row), gid_packed,
                 zero_i],
                axis=0,
            )  # [8, K] int32
        pos = tile_ranges(sort_tile, num_tiles)
        tile_start = pos[:num_tiles]
        tile_count = pos[1:] - pos[:-1]
        if PACK_ALIGN:
            # 256-align the packed runs so the compositor DMAs blocks
            # directly (no in-kernel window roll); padding rows are zeroed
            # int32 entries that decode to opacity 0 (dead on arrival)
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
            aligned_blocks = jnp.zeros((0, NUM_ATTRS, BLOCK), jnp.float32)
        return BinnedBlocks(
            flat_entries=flat_entries,
            aligned_blocks=aligned_blocks,
            tile_start=tile_start,
            tile_count=tile_count,
            ablock_start=ablock_start,
            sorted_tile=sort_tile,
            num_rendered=total,
            slot_gauss=g.astype(jnp.int32),
            compact_gid=jnp.arange(n, dtype=jnp.int32),
        )
    if pack_geo:
        tile_f = sort_tile.astype(jnp.float32)
        tyf = jnp.floor(tile_f / jnp.float32(grid_x))
        txf = tile_f - tyf * grid_x
        dx_row, dy_row = _unpack2_f16(sorted_ops[2])
        ca_row, cb_row = _unpack2_f16(sorted_ops[3])
        if pack_rgb10:
            cc_row, op_row = _unpack2_f16(sorted_ops[4])
            cc_row = cc_row * (1.0 / _CONIC_SCALE)
            rgb10 = sorted_ops[5]
            dq10 = lambda v: v.astype(jnp.float32) * (4.0 / 1023.0)
            r_row = dq10(rgb10 & 1023)
            g_row = dq10((rgb10 >> 10) & 1023)
            b_row = dq10((rgb10 >> 20) & 1023)
        else:
            cc_row = sorted_ops[4]
            r_row, g_row = _unpack2_f16(sorted_ops[5])
            b_row, op_row = _unpack2_f16(sorted_ops[6])
        attr_rows = [
            dx_row + 16.0 * txf, dy_row + 16.0 * tyf,
            ca_row * (1.0 / _CONIC_SCALE), cb_row * (1.0 / _CONIC_SCALE),
            cc_row,
            op_row, r_row, g_row, b_row, dep_row,
        ]
    elif pack_f16:
        r_row, g_row = _unpack2_f16(sorted_ops[7])
        b_row, op_row = _unpack2_f16(sorted_ops[8])
        attr_rows = list(sorted_ops[2:7]) + [
            op_row, r_row, g_row, b_row, dep_row,
        ]
    else:
        attr_rows = list(sorted_ops[2:11]) + [dep_row]
    nxt = 2 + n_attr_ops
    if carry_gid:
        gid_row = sorted_ops[nxt]
        nxt += 1
    else:
        gid_row = zero_row
    slot_row = sorted_ops[nxt] if carry_slot else zero_row
    flat_entries = jnp.stack(
        attr_rows
        + [gid_row, valid_row, slot_row, zero_row, zero_row, zero_row],
        axis=0,
    )  # [16, K]; row 12 = original slot index

    # per-tile ranges from the Pallas boundary scan over the sorted keys
    # (~1-2ms; XLA searchsorted is ~6ms, scatter/segment-sum ~23ms, and the
    # XLA-side MXU one-hot histogram materializes its one-hots to HBM)
    pos = tile_ranges(sort_tile, num_tiles)
    tile_start = pos[:num_tiles]
    tile_count = pos[1:] - pos[:-1]

    # 5. realign every tile's run to a 256-multiple start (see realign_runs).
    # The flat-mode compositor (inference) rolls runs into place in-kernel,
    # so callers that never run the backward skip this pass entirely.
    if realign:
        nb_al = aligned_capacity(K, num_tiles)
        abpt = (tile_count + BLOCK - 1) // BLOCK  # aligned blocks per tile
        ablock_start = (jnp.cumsum(abpt) - abpt).astype(jnp.int32)
        # dest block -> owning tile: marker scatter + cumsum over [nb_al]
        # (ties from empty tiles resolve to the last = the real owner)
        bmark = jnp.zeros((nb_al,), jnp.int32).at[ablock_start].add(
            1, mode="drop"
        )
        blk_tile = jnp.clip(jnp.cumsum(bmark) - 1, 0, num_tiles - 1)
        blk_k = jnp.arange(nb_al, dtype=jnp.int32) - ablock_start[blk_tile]
        src_lo = tile_start[blk_tile] + blk_k * BLOCK
        vcnt = jnp.clip(tile_count[blk_tile] - blk_k * BLOCK, 0, BLOCK)
        aligned_blocks = realign_runs(flat_entries, src_lo, vcnt, nb_al)
    else:
        ablock_start = jnp.zeros_like(tile_start)
        aligned_blocks = jnp.zeros((0, NUM_ATTRS, BLOCK), jnp.float32)

    return BinnedBlocks(
        flat_entries=flat_entries,
        aligned_blocks=aligned_blocks,
        tile_start=tile_start,
        tile_count=tile_count,
        ablock_start=ablock_start,
        sorted_tile=sort_tile,
        num_rendered=total,
        slot_gauss=g.astype(jnp.int32),
        compact_gid=jnp.arange(n, dtype=jnp.int32),  # preprocess order
    )


def aligned_capacity(num_entries: int, num_tiles: int) -> int:
    """Static block capacity of the 256-aligned layout: every tile can waste
    at most BLOCK-1 slots, rounded up so the realign grid divides evenly."""
    nb = num_entries // BLOCK + num_tiles
    return -(-nb // _RA_SUPER) * _RA_SUPER


def compat_arrays(binned: BinnedBlocks, grid_x: int, grid_y: int):
    """Expose the flat sorted layout as rasterize_ref-style entry arrays
    (gid, tile, valid, tile_start) so the XLA reverse-walk backward can run
    against the Pallas forward's binning."""
    num_tiles = grid_x * grid_y
    tile = binned.sorted_tile
    valid = (binned.flat_entries[11] > 0.5) & (tile < num_tiles)
    # original gaussian id via slot -> compact owner -> original (row 10 is
    # zeroed when the forward ran with carry_gid=False); this small-table
    # double gather is CPU-fallback-only
    slot = binned.flat_entries[12].astype(jnp.int32)
    gid = binned.compact_gid[binned.slot_gauss[slot]]
    gid = jnp.where(valid, gid, 0)
    return gid, tile, valid, binned.tile_start
