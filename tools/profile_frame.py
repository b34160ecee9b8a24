"""Per-stage frame profiler on the real TPU.

Times each stage of the fast render path separately (own jit, honest
scalar-read fence) plus the whole frame in one jit, for BOTH pipeline
modes (train: exact payloads + realign; inference: packed payloads +
flat-mode compositor). Used to decide which perf lever to pull next;
numbers go to docs/PERF.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_scene
from gaustudio_tpu.ops import binning_fast, gaussian, rasterize as rast
from gaustudio_tpu.ops import rasterize_pallas
from gaustudio_tpu.ops.rasterize import RasterizeSettings


def sync(x):
    return float(jnp.reshape(x, (-1,))[0].astype(jnp.float32))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    H, W = 1080, 1920
    tanfov = 0.85
    znear, zfar = 0.01, 100.0
    tanfovy = tanfov * H / W
    W2V = np.eye(4, dtype=np.float32)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tanfov
    P[1, 1] = 1 / tanfovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    xyz, scales, quats, opac, colors = make_scene()
    args = tuple(jnp.asarray(a) for a in (xyz, scales, quats, opac, colors))

    settings = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfovy,
        bg=jnp.zeros(3, jnp.float32),
        viewmatrix=jnp.asarray(W2V.T), projmatrix=jnp.asarray((P @ W2V).T),
        campos=jnp.zeros(3, jnp.float32),
        num_entries=0, chunk=4096,
    )
    cap = rast.suggest_num_entries(
        args[0], args[3], settings, scales=args[1], rotations=args[2],
        margin=1.1,
    )
    settings = settings._replace(num_entries=cap)
    grid_x = (W + gaussian.TILE_X - 1) // gaussian.TILE_X
    grid_y = (H + gaussian.TILE_Y - 1) // gaussian.TILE_Y
    num_tiles = grid_x * grid_y
    K = cap
    print(f"num_entries capacity = {cap}", flush=True)

    @jax.jit
    def stage_pre(xyz, scales, quats, opac, colors):
        return gaussian.preprocess(
            xyz, opac, settings.viewmatrix, settings.projmatrix,
            settings.campos, W, H, settings.tanfovx, settings.tanfovy,
            colors_precomp=colors, scales=scales, rotations=quats,
        )

    ms, pre = timeit(stage_pre, *args)
    print(f"preprocess: {ms:.2f} ms", flush=True)

    for mode, kw in (
        ("train", dict(carry_gid=False, carry_slot=True, realign=True)),
        ("inference", dict(carry_gid=True, carry_slot=False, realign=False)),
    ):
        @jax.jit
        def stage_bin(pre, kw=kw):
            return binning_fast.bin_gaussians_fast(pre, grid_x, grid_y, cap,
                                                   **kw)

        ms, binned = timeit(stage_bin, pre)
        print(f"binning (all, {mode}): {ms:.2f} ms  "
              f"num_rendered={int(binned.num_rendered)}", flush=True)

        use_flat = not kw["realign"]

        @jax.jit
        def stage_comp(binned, use_flat=use_flat, wm=kw["carry_gid"]):
            return rasterize_pallas.composite_pallas(
                binned, grid_x, grid_y, with_median=wm, use_flat=use_flat)

        ms, packed = timeit(stage_comp, binned)
        print(f"compositor ({mode}{', flat' if use_flat else ''}): "
              f"{ms:.2f} ms", flush=True)
        empty = binned._replace(tile_count=jnp.zeros_like(binned.tile_count))
        ms, _ = timeit(stage_comp, empty)
        print(f"compositor (empty, {mode}): {ms:.2f} ms", flush=True)

    # binning sub-stages (new r3 pipeline: no compact sort)
    n = pre.depths.shape[0]

    @jax.jit
    def sub_slotgeom(pre):
        tiles_alloc = jnp.maximum(pre.tiles_touched.astype(jnp.int32), 1)
        starts = binning_fast._blocked_cumsum(tiles_alloc).astype(jnp.int32)
        total = starts[-1] + tiles_alloc[-1]
        block_lo = binning_fast.block_lo_from_starts(starts, K)
        return block_lo, starts, total

    ms, (block_lo, starts, total) = timeit(sub_slotgeom, pre)
    print(f"  slot geometry (cumsum + block_lo scan): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_expand(pre, block_lo, starts, total):
        rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
        tiles_t = pre.tiles_touched.astype(jnp.int32)
        valid_g = pre.valid & (tiles_t > 0)
        iota_f = jnp.arange(n, dtype=jnp.float32)
        table = binning_fast.expand_table(
            [
                pre.means2d[:, 0], pre.means2d[:, 1],
                pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2],
                pre.opacities,
                pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
                pre.depths, iota_f, valid_g.astype(jnp.float32),
                starts.astype(jnp.float32),
                pre.rect_min[:, 0].astype(jnp.float32),
                pre.rect_min[:, 1].astype(jnp.float32),
                rect_w.astype(jnp.float32),
                iota_f,
            ]
        )
        return binning_fast.fused_expand(
            table, block_lo, total, grid_x, num_tiles, n, K
        )

    ms, expanded_t = timeit(sub_expand, pre, block_lo, starts, total)
    print(f"  fused expand (select+tileid+cull): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_sort_train(expanded_t):
        slot = jnp.arange(K, dtype=jnp.float32)
        tile = expanded_t[13].astype(jnp.int32)
        cols = tuple(expanded_t[a] for a in range(9)) + (slot,)
        return jax.lax.sort((tile, expanded_t[9]) + cols, num_keys=2,
                            is_stable=False)

    ms, sorted_ops = timeit(sub_sort_train, expanded_t)
    print(f"  tile sort (train, 12 ops @ {K}): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_sort_inf(expanded_t):
        # mirrors the r4+ packed inference sort (binning_fast pack_key1):
        # ONE fused uint32 (tile | depth19) key + 4 packed payloads + gid
        tile = expanded_t[13].astype(jnp.int32)
        tyf = jnp.floor(expanded_t[13] / jnp.float32(grid_x))
        txf = expanded_t[13] - tyf * grid_x
        dx = expanded_t[0] - 16.0 * txf
        dy = expanded_t[1] - 16.0 * tyf
        q10 = lambda v: jnp.round(
            jnp.clip(v, 0.0, 4.0) * binning_fast._RGB10_SCALE
        ).astype(jnp.int32)
        rgb10 = (q10(expanded_t[6]) | (q10(expanded_t[7]) << 10)
                 | (q10(expanded_t[8]) << 20))
        cols = (
            binning_fast._pack2_f16(dx, dy),
            binning_fast._pack2_f16(expanded_t[2] * 16384.0,
                                    expanded_t[3] * 16384.0),
            binning_fast._pack2_f16(expanded_t[4] * 16384.0, expanded_t[5]),
            rgb10,
            expanded_t[10],
        )
        dbits = jax.lax.bitcast_convert_type(expanded_t[9], jnp.uint32)
        key = (tile.astype(jnp.uint32) << 19) | (
            (dbits >> binning_fast._DEPTH_Q_SHIFT) & jnp.uint32(0x7FFFF))
        return jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)

    ms, _ = timeit(sub_sort_inf, expanded_t)
    print(f"  tile sort (inference, 6 ops @ {K}): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_stack(sorted_ops):
        sort_tile = sorted_ops[0]
        valid_row = (sort_tile < num_tiles).astype(jnp.float32)
        zero_row = jnp.zeros((K,), jnp.float32)
        return jnp.stack(
            list(sorted_ops[2:11]) + [sorted_ops[1], zero_row, valid_row,
                                      sorted_ops[11], zero_row, zero_row,
                                      zero_row],
            axis=0,
        )

    ms, flat_entries = timeit(sub_stack, sorted_ops)
    print(f"  flat stack: {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_ranges(sort_tile):
        return binning_fast.tile_ranges(sort_tile, num_tiles)

    ms, _ = timeit(sub_ranges, sorted_ops[0])
    print(f"  ranges (Pallas boundary scan): {ms:.2f} ms", flush=True)

    @jax.jit
    def stage_bin_train(pre):
        return binning_fast.bin_gaussians_fast(
            pre, grid_x, grid_y, cap, carry_gid=False, carry_slot=True)

    _, binned2 = timeit(stage_bin_train, pre)

    @jax.jit
    def sub_realign(binned):
        nb_al = binning_fast.aligned_capacity(K, num_tiles)
        abpt = (binned.tile_count + binning_fast.BLOCK - 1) // binning_fast.BLOCK
        ablock_start = (jnp.cumsum(abpt) - abpt).astype(jnp.int32)
        bmark = jnp.zeros((nb_al,), jnp.int32).at[ablock_start].add(1, mode="drop")
        blk_tile = jnp.clip(jnp.cumsum(bmark) - 1, 0, num_tiles - 1)
        blk_k = jnp.arange(nb_al, dtype=jnp.int32) - ablock_start[blk_tile]
        src_lo = binned.tile_start[blk_tile] + blk_k * binning_fast.BLOCK
        vcnt = jnp.clip(binned.tile_count[blk_tile] - blk_k * binning_fast.BLOCK,
                        0, binning_fast.BLOCK)
        return binning_fast.realign_runs(binned.flat_entries, src_lo, vcnt, nb_al)

    ms, _ = timeit(sub_realign, binned2)
    print(f"  realign (train only): {ms:.2f} ms", flush=True)

    # whole frames, one jit each
    for mode, ng in (("train-mode", True), ("inference", False)):
        st = settings._replace(need_grads=ng)

        @jax.jit
        def whole(xyz, scales, quats, opac, colors, st=st):
            out = rast.rasterize(
                xyz, opac, st,
                colors_precomp=colors, scales=scales, rotations=quats,
            )
            return out["render"]

        ms, _ = timeit(whole, *args, iters=20)
        print(f"WHOLE FRAME ({mode}): {ms:.2f} ms = "
              f"{H * W / 1e6 / (ms / 1e3):.2f} MPix/s", flush=True)


if __name__ == "__main__":
    main()
