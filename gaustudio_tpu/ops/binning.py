"""Tile binning: Gaussian -> (tile, depth)-sorted intersection entries.

TPU-native re-design of the CUDA binning stage
(rasterizer_impl.cu:70-138, 280-321: InclusiveSum + duplicateWithKeys +
RadixSort + identifyTileRanges).  Instead of a dynamically-sized key buffer,
the duplicated entry list has a *static* capacity ``num_entries`` (bucketed
to powers of two by the caller — the TPU substitute for the reference's
device->host ``num_rendered`` memcpy + realloc, rasterizer_impl.cu:284).

The expansion "which gaussian does flat slot k belong to" is a vectorized
``searchsorted`` over the inclusive-cumsum of ``tiles_touched`` — no scatter,
no atomic, fully fused by XLA.  Ordering matches the reference exactly:
entries are sorted by (tile_id, view depth) with a stable sort, and within a
gaussian the touched tiles enumerate row-major over its rect
(rasterizer_impl.cu:90-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustudio_tpu.ops.gaussian import Preprocessed


class Binned(NamedTuple):
    """Sorted intersection entries + per-tile ranges (the CUDA BinningState +
    ImageState.ranges, rasterizer_impl.h:44-61)."""

    gauss_id: jnp.ndarray  # [K] int32 gaussian index per entry
    tile_id: jnp.ndarray  # [K] int32 tile per entry (== num_tiles for padding)
    entry_valid: jnp.ndarray  # [K] bool
    tile_start: jnp.ndarray  # [T] int32 first entry of each tile
    tile_count: jnp.ndarray  # [T] int32 number of entries of each tile
    num_rendered: jnp.ndarray  # [] int32 total real entries (pre-truncation)


def count_entries(tiles_touched) -> jnp.ndarray:
    """Total number of (gaussian, tile) pairs; used for capacity bucketing."""
    return jnp.sum(tiles_touched)


def bucket_capacity(total: int, minimum: int = 8192, growth: float = 1.12,
                    quantum: int = 4096) -> int:
    """Round a measured entry count up to a geometric bucket.

    Host-side helper: keeps the number of distinct compiled shapes
    logarithmic in scene size (the padding/bucketing discipline from
    SURVEY.md §7 hard-part 2) while wasting at most ``growth``-1 capacity.
    Buckets are multiples of ``quantum`` (the fast path's BLOCK * SUPER).
    """
    cap = minimum
    while cap < total:
        cap = int(cap * growth)
    return -(-cap // quantum) * quantum


def bin_gaussians(pre: Preprocessed, grid_x: int, grid_y: int, num_entries: int) -> Binned:
    """Expand + sort gaussian/tile intersections.

    Args:
        pre: preprocess results (tiles_touched is 0 for culled gaussians).
        grid_x, grid_y: static tile-grid dims.
        num_entries: static capacity K of the entry list. If the real total
            exceeds it, the *last* entries in (gaussian-major) order are
            dropped (callers bucket the capacity so this only happens inside
            fully-jitted training loops with a fixed cap).

    Returns:
        Binned entries sorted by (tile, depth), stable in duplication order.
    """
    n = pre.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    tiles = pre.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(tiles)  # inclusive, [N]
    total = offsets[-1]

    ks = jnp.arange(num_entries, dtype=jnp.int32)
    # slot k belongs to gaussian g = first index with offsets[g] > k
    g = jnp.searchsorted(offsets, ks, side="right").astype(jnp.int32)
    gc = jnp.minimum(g, n - 1)
    start = offsets[gc] - tiles[gc]
    j = ks - start  # ordinal of this entry within its gaussian's rect

    rect_min = pre.rect_min[gc]  # [K, 2]
    rect_w = jnp.maximum(pre.rect_max[gc, 0] - rect_min[:, 0], 1)
    tx = rect_min[:, 0] + j % rect_w
    ty = rect_min[:, 1] + j // rect_w
    tile = ty * grid_x + tx

    valid = ks < jnp.minimum(total, num_entries)
    tile = jnp.where(valid, tile, num_tiles)  # sentinel: sorts last

    # Stable lexicographic sort by (tile, depth) — the reference's 64-bit
    # tile<<32|depth radix sort (rasterizer_impl.cu:98-109, 303-311).
    depth = pre.depths[gc]
    sort_tile, _sort_depth, sorted_g, sorted_valid = jax.lax.sort(
        (tile, depth, gc, valid), num_keys=2, is_stable=True
    )

    # Per-tile ranges via binary search over the sorted tile ids
    # (replaces identifyTileRanges, rasterizer_impl.cu:116-138).
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sort_tile, tids, side="right").astype(jnp.int32)

    return Binned(
        gauss_id=sorted_g,
        tile_id=sort_tile,
        entry_valid=sorted_valid,
        tile_start=starts,
        tile_count=ends - starts,
        num_rendered=total,
    )
