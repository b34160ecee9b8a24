"""Tile-based triangle mesh rasterizer (z-buffer) in pure JAX.

Replaces the reference's pytorch3d MeshRasterizer dependency
(scripts/render_mesh.py:17-33, scripts/texture_mesh.py:18-26) with the same
tile machinery the Gaussian rasterizer uses: triangles expand into
(triangle, tile) entries, each entry is tested against its tile's 256
pixels (barycentric inside test + perspective-correct depth), and the
z-buffer is a per-pixel segment-min with a second pass recovering the
winning triangle id and barycentrics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaustudio_tpu.ops.gaussian import (
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
    ndc2pix,
    transform_points,
)
from gaustudio_tpu.ops.rasterize_ref import _pixel_grid, tiles_to_image

_FAR = 3.0e38


class MeshFragments(NamedTuple):
    depth: jnp.ndarray  # [H, W] view-space z (FAR where empty)
    tri_id: jnp.ndarray  # [H, W] int32 (-1 where empty)
    bary: jnp.ndarray  # [H, W, 3]
    mask: jnp.ndarray  # [H, W] bool


def rasterize_mesh(vertices, faces, viewmatrix, projmatrix,
                   image_width: int, image_height: int,
                   num_entries: int = 1 << 20, chunk: int = 2048) -> MeshFragments:
    """Z-buffer rasterization of a triangle mesh.

    Args:
        vertices: [V, 3] world positions.
        faces: [F, 3] int32.
        viewmatrix/projmatrix: transposed W2V / full-proj (camera convention).
    """
    H, W = image_height, image_width
    grid_x = (W + TILE_X - 1) // TILE_X
    grid_y = (H + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    T1 = num_tiles + 1

    # project vertices (scalarized: f32 `@` runs in bf16 on the TPU MXU)
    hom = transform_points(vertices, projmatrix)
    wclip = hom[:, 3]
    ndc = hom[:, :3] / (wclip[:, None] + 1e-9)
    px = ndc2pix(ndc[:, 0], W)
    py = ndc2pix(ndc[:, 1], H)
    zview = transform_points(vertices, viewmatrix)[:, 2]

    v2d = jnp.stack([px, py], -1)  # [V, 2]
    f = faces.astype(jnp.int32)
    p0, p1, p2 = v2d[f[:, 0]], v2d[f[:, 1]], v2d[f[:, 2]]
    z0, z1, z2 = zview[f[:, 0]], zview[f[:, 1]], zview[f[:, 2]]
    w0, w1, w2 = wclip[f[:, 0]], wclip[f[:, 1]], wclip[f[:, 2]]

    in_front = (z0 > 1e-3) & (z1 > 1e-3) & (z2 > 1e-3)

    # tile rect per triangle
    xmin = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
    xmax = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
    ymin = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
    ymax = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
    tx0 = jnp.clip(jnp.floor(xmin / TILE_X), 0, grid_x).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / TILE_X) + 1, 0, grid_x).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / TILE_Y), 0, grid_y).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / TILE_Y) + 1, 0, grid_y).astype(jnp.int32)
    tiles_touched = jnp.where(in_front, (tx1 - tx0) * (ty1 - ty0), 0)

    # expansion (marker scatter + cumsum, like binning_fast)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(tiles_touched)[:-1].astype(jnp.int32)]
    )
    K = num_entries
    marker = jnp.zeros((K,), jnp.int32)
    put = jnp.where((tiles_touched > 0) & (starts < K), starts, K)
    marker = marker.at[put].add(1, mode="drop")
    g = jnp.maximum(jnp.cumsum(marker) - 1, 0)
    total = starts[-1] + tiles_touched[-1]
    slot_valid = jnp.arange(K) < jnp.minimum(total, K)

    jslot = jnp.arange(K, dtype=jnp.int32) - starts[g]
    rw = jnp.maximum(tx1[g] - tx0[g], 1)
    etx = tx0[g] + jslot % rw
    ety = ty0[g] + jslot // rw
    tile = jnp.where(slot_valid, ety * grid_x + etx, num_tiles)

    # sorted by construction? entries are triangle-major; tile order arbitrary
    tile, g = jax.lax.sort((tile, g), num_keys=1, is_stable=True)

    # per-entry edge data
    def edge(pa, pb):
        # edge function coefficients: E(p) = (pb-pa) x (p-pa)
        d = pb - pa
        return d[:, 1], -d[:, 0], -(d[:, 1] * pa[:, 0] - d[:, 0] * pa[:, 1])

    n_chunks = K // chunk

    init = dict(
        z=jnp.full((T1, TILE_PIXELS), _FAR, jnp.float32),
    )

    def zpass(state, ci):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, ci * chunk, chunk)
        t = sl(tile)
        gi = sl(g)
        pxs, pys = _pixel_grid(t, grid_x)
        a0, b0c, c0 = edge(p1[gi], p2[gi])
        a1, b1c, c1 = edge(p2[gi], p0[gi])
        a2, b2c, c2 = edge(p0[gi], p1[gi])
        e0 = a0[:, None] * pxs + b0c[:, None] * pys + c0[:, None]
        e1 = a1[:, None] * pxs + b1c[:, None] * pys + c1[:, None]
        e2 = a2[:, None] * pxs + b2c[:, None] * pys + c2[:, None]
        area = e0 + e1 + e2
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        inside &= jnp.abs(area) > 1e-12
        inside &= sl(slot_valid)[:, None]
        l0 = e0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        l1 = e1 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        l2 = 1.0 - l0 - l1
        # perspective-correct depth: 1/z interpolates linearly in screen space
        invz = l0 / z0[gi][:, None] + l1 / z1[gi][:, None] + l2 / z2[gi][:, None]
        depth = 1.0 / jnp.maximum(invz, 1e-9)
        depth = jnp.where(inside & (depth > 1e-3), depth, _FAR)
        zmin = jax.ops.segment_min(depth, t, num_segments=T1, indices_are_sorted=True)
        state["z"] = jnp.minimum(state["z"], zmin)
        return state, None

    state, _ = jax.lax.scan(zpass, init, jnp.arange(n_chunks, dtype=jnp.int32))
    zbuf = state["z"]

    init2 = dict(
        tri=jnp.full((T1, TILE_PIXELS), jnp.int32(2**30), jnp.int32),
        b0=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
        b1=jnp.zeros((T1, TILE_PIXELS), jnp.float32),
    )

    def winpass(state, ci):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, ci * chunk, chunk)
        t = sl(tile)
        gi = sl(g)
        pxs, pys = _pixel_grid(t, grid_x)
        a0, b0c, c0 = edge(p1[gi], p2[gi])
        a1, b1c, c1 = edge(p2[gi], p0[gi])
        a2, b2c, c2 = edge(p0[gi], p1[gi])
        e0 = a0[:, None] * pxs + b0c[:, None] * pys + c0[:, None]
        e1 = a1[:, None] * pxs + b1c[:, None] * pys + c1[:, None]
        e2 = a2[:, None] * pxs + b2c[:, None] * pys + c2[:, None]
        area = e0 + e1 + e2
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        inside &= jnp.abs(area) > 1e-12
        inside &= sl(slot_valid)[:, None]
        l0 = e0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        l1 = e1 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        l2 = 1.0 - l0 - l1
        invz = l0 / z0[gi][:, None] + l1 / z1[gi][:, None] + l2 / z2[gi][:, None]
        depth = 1.0 / jnp.maximum(invz, 1e-9)
        won = inside & (depth <= zbuf[t] * (1 + 1e-6)) & (depth > 1e-3)
        tri = jnp.where(won, gi[:, None], 2**30)
        tri_min = jax.ops.segment_min(tri, t, num_segments=T1, indices_are_sorted=True)
        # winner = smallest id among z-passing triangles (tie-break)
        upd = tri_min < state["tri"]
        state["tri"] = jnp.minimum(state["tri"], tri_min)
        bsel = won & (gi[:, None] == tri_min[t])
        bl0 = jax.ops.segment_max(jnp.where(bsel, l0, -_FAR), t, num_segments=T1,
                                  indices_are_sorted=True)
        bl1 = jax.ops.segment_max(jnp.where(bsel, l1, -_FAR), t, num_segments=T1,
                                  indices_are_sorted=True)
        state["b0"] = jnp.where(upd, jnp.where(bl0 > -_FAR, bl0, 0.0), state["b0"])
        state["b1"] = jnp.where(upd, jnp.where(bl1 > -_FAR, bl1, 0.0), state["b1"])
        return state, None

    state2, _ = jax.lax.scan(winpass, init2, jnp.arange(n_chunks, dtype=jnp.int32))

    to_img = lambda x: tiles_to_image(x, grid_x, grid_y, H, W)
    depth_img = to_img(zbuf)
    tri_img = to_img(state2["tri"])
    b0 = to_img(state2["b0"])
    b1 = to_img(state2["b1"])
    mask = depth_img < _FAR
    tri_img = jnp.where(mask, tri_img, -1)
    bary = jnp.stack([b0, b1, 1.0 - b0 - b1], -1)
    return MeshFragments(
        depth=jnp.where(mask, depth_img, 0.0),
        tri_id=tri_img,
        bary=jnp.where(mask[..., None], bary, 0.0),
        mask=mask,
    )


def interpolate_attribute(frag: MeshFragments, faces, vertex_attr):
    """Barycentric interpolation of per-vertex attributes -> [H, W, C]."""
    f = jnp.asarray(faces, jnp.int32)
    tid = jnp.maximum(frag.tri_id, 0)
    tri_verts = f[tid]  # [H, W, 3]
    a = vertex_attr[tri_verts]  # [H, W, 3, C]
    out = jnp.einsum("hwk,hwkc->hwc", frag.bary, a,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.where(frag.mask[..., None], out, 0.0)


def face_normals(vertices, faces):
    v = jnp.asarray(vertices)
    f = jnp.asarray(faces, jnp.int32)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    n = jnp.cross(e1, e2)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)
