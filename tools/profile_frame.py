"""Per-stage frame profiler on the real TPU.

Times each stage of the fast render path separately (own jit, honest
scalar-read fence) plus the whole frame in one jit. Used to decide which
perf lever to pull next; numbers go to PLAN.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_scene
from gaustudio_tpu.ops import binning, binning_fast, gaussian, rasterize as rast
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

    @jax.jit
    def stage_bin(pre):
        return binning_fast.bin_gaussians_fast(pre, grid_x, grid_y, cap)

    ms, binned = timeit(stage_bin, pre)
    print(f"binning (all): {ms:.2f} ms", flush=True)
    print(f"num_rendered = {int(binned.num_rendered)}", flush=True)

    @jax.jit
    def stage_comp(binned):
        return rasterize_pallas.composite_pallas(binned, grid_x, grid_y)

    ms, packed = timeit(stage_comp, binned)
    print(f"compositor: {ms:.2f} ms", flush=True)

    # empty-workload compositor: same tile structure, zero counts
    empty = binned._replace(tile_count=jnp.zeros_like(binned.tile_count))
    ms, _ = timeit(stage_comp, empty)
    print(f"compositor (empty): {ms:.2f} ms", flush=True)

    # binning sub-stages
    n = pre.depths.shape[0]
    K = cap

    @jax.jit
    def sub_compact(pre):
        invalid = pre.valid.astype(jnp.int32) ^ 1
        rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
        sorted_g = jax.lax.sort(
            (
                invalid, pre.depths,
                pre.means2d[:, 0], pre.means2d[:, 1],
                pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2],
                pre.opacities,
                pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
                jnp.arange(n, dtype=jnp.float32),
                pre.tiles_touched.astype(jnp.int32),
                pre.rect_min[:, 0].astype(jnp.float32),
                pre.rect_min[:, 1].astype(jnp.float32),
                rect_w.astype(jnp.float32),
            ),
            num_keys=2, is_stable=True,
        )
        return sorted_g

    ms, sorted_g = timeit(sub_compact, pre)
    print(f"  compact sort (16 ops @ {n}): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_slotgeom(tiles_c):
        starts = binning_fast._blocked_cumsum(tiles_c).astype(jnp.int32)
        total = starts[-1] + tiles_c[-1]
        nb = K // binning_fast.BLOCK
        blk_key = (starts + binning_fast.BLOCK - 1) // binning_fast.BLOCK
        block_lo = jnp.maximum(
            binning_fast.tile_ranges(blk_key, nb)[1:] - 1, 0
        )
        return block_lo, starts, total

    ms, (block_lo, starts, total) = timeit(sub_slotgeom, sorted_g[12])
    print(f"  slot geometry (cumsum + block_lo scan): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_expand(sorted_g, block_lo, starts, total):
        dep_s = sorted_g[1]
        valid_s = (sorted_g[0] == 0).astype(jnp.float32)
        table = binning_fast.expand_table(
            [
                sorted_g[2], sorted_g[3], sorted_g[4], sorted_g[5], sorted_g[6],
                sorted_g[7], sorted_g[8], sorted_g[9], sorted_g[10],
                dep_s, sorted_g[11], valid_s,
                starts.astype(jnp.float32),
                sorted_g[13], sorted_g[14], sorted_g[15],
                jnp.arange(n, dtype=jnp.float32),
            ]
        )
        return binning_fast.fused_expand(
            table, block_lo, total, grid_x, grid_x * grid_y, n, K
        )

    ms, expanded_t = timeit(sub_expand, sorted_g, block_lo, starts, total)
    print(f"  fused expand (select+tileid+cull): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_sort(expanded_t):
        slot = jnp.arange(K, dtype=jnp.int32)
        tile = expanded_t[13].astype(jnp.int32)
        cols = tuple(expanded_t[a] for a in range(11))
        cols = cols + (slot.astype(jnp.float32),)
        return jax.lax.sort((tile,) + cols, num_keys=1, is_stable=True)

    ms, sorted_ops = timeit(sub_sort, expanded_t)
    print(f"  tile sort (13 ops @ {K}): {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_stack(sorted_ops):
        num_tiles = grid_x * grid_y
        sort_tile = sorted_ops[0]
        valid_row = (sort_tile < num_tiles).astype(jnp.float32)
        zero_row = jnp.zeros((K,), jnp.float32)
        flat_entries = jnp.stack(
            list(sorted_ops[1:12])
            + [valid_row, sorted_ops[12], zero_row, zero_row, zero_row],
            axis=0,
        )
        return flat_entries

    ms, flat_entries = timeit(sub_stack, sorted_ops)
    print(f"  flat stack: {ms:.2f} ms", flush=True)

    ms, binned2 = timeit(stage_bin, pre)
    @jax.jit
    def sub_realign(binned):
        num_tiles = grid_x * grid_y
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
    print(f"  realign: {ms:.2f} ms", flush=True)

    @jax.jit
    def sub_ranges(sort_tile):
        num_tiles = grid_x * grid_y
        pos = jnp.searchsorted(
            sort_tile, jnp.arange(num_tiles + 1, dtype=sort_tile.dtype)
        ).astype(jnp.int32)
        return pos

    ms, _ = timeit(sub_ranges, sorted_ops[0])
    print(f"  ranges searchsorted: {ms:.2f} ms", flush=True)

    # whole frame
    @jax.jit
    def whole(xyz, scales, quats, opac, colors):
        out = rast.rasterize(
            xyz, opac, settings,
            colors_precomp=colors, scales=scales, rotations=quats,
        )
        return out["render"]

    ms, _ = timeit(whole, *args, iters=20)
    print(f"WHOLE FRAME: {ms:.2f} ms = {H * W / 1e6 / (ms / 1e3):.2f} MPix/s", flush=True)


if __name__ == "__main__":
    main()
