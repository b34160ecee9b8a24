"""Isosurface extraction — marching tetrahedra on a dense grid.

TPU-native replacement for the reference's marching-cubes backends
(``vdbfusion.extract_triangle_mesh`` in scripts/extract_mesh.py:145,
``mcubes``/``cumcubes`` in pipelines/initializers/mask.py:10-14 and
utils/graphics_utils.py:239-284).  Each grid cube is split into 6
tetrahedra; per-tet surface triangles are generated from a 16-case table in
a jitted slab kernel (static shapes + validity masks), and the host
compacts the soup, dedups edge-keyed vertices, and orients triangles by the
field gradient — sidestepping hand-maintained winding tables entirely.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# corner c of a cube: offset (c&1, (c>>1)&1, (c>>2)&1)
_CUBE_OFFSETS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int32
)

# 6-tetrahedra decomposition around the 0-7 main diagonal
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int32,
)


def _build_case_table():
    """16-case marching-tetrahedra table: up to 2 triangles, each vertex an
    (cornerA, cornerB) crossing edge of the tet; -1 padded."""
    table = -np.ones((16, 2, 3, 2), np.int32)

    def tri(*edges):
        return np.array(edges, np.int32)

    singles = {1: 0, 2: 1, 4: 2, 8: 3}
    for mask, v in singles.items():
        others = [o for o in range(4) if o != v]
        t = tri(*[(v, o) for o in others])
        table[mask, 0] = t
        table[15 ^ mask, 0] = t  # complement: same edges
    pairs = {3: (0, 1), 5: (0, 2), 9: (0, 3)}
    for mask, (a, b) in pairs.items():
        others = [o for o in range(4) if o not in (a, b)]
        c, d = others
        # crossing edges: (a,c),(a,d),(b,c),(b,d) -> quad -> 2 triangles
        t0 = tri((a, c), (a, d), (b, d))
        t1 = tri((a, c), (b, d), (b, c))
        for m in (mask, 15 ^ mask):
            table[m, 0] = t0
            table[m, 1] = t1
    return table


_CASE_TABLE = jnp.asarray(_build_case_table())  # [16, 2, 3, 2]


@partial(jax.jit, static_argnames=("min_weight",))
def _slab_triangles(vals, weight, z0, iso, min_weight: float):
    """Generate the triangle soup of one z-slab of cubes.

    Args:
        vals: [X, Y, dz+1] scalar field slab.
        weight: [X, Y, dz+1] confidence (or ones).
        z0: global z index of the slab's first layer.
        iso: isovalue.

    Returns:
        positions [M, 3] (grid units, global), edge_keys [M, 2] int32 pairs
        of flattened *local-slab* grid vertex ids (z-global encoded), valid
        [M//3] per-triangle mask. M = ncubes*6tets*2tris*3.
    """
    X, Y, Z1 = vals.shape
    nx, ny, nz = X - 1, Y - 1, Z1 - 1

    cx, cy, cz = jnp.meshgrid(
        jnp.arange(nx), jnp.arange(ny), jnp.arange(nz), indexing="ij"
    )
    cube_base = jnp.stack([cx, cy, cz], -1).reshape(-1, 3)  # [C, 3]
    C = cube_base.shape[0]

    corner_pos = cube_base[:, None, :] + jnp.asarray(_CUBE_OFFSETS)[None]  # [C,8,3]
    cv = vals[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]  # [C,8]
    cw = weight[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]
    cube_ok = jnp.min(cw, axis=1) >= min_weight

    tets = jnp.asarray(_TETS)  # [6,4]
    tv = cv[:, tets]  # [C, 6, 4]
    tmask = jnp.sum((tv < iso).astype(jnp.int32) << jnp.arange(4), axis=-1)  # [C,6]

    # per (cube, tet): look up 2 candidate triangles of 3 edges
    tri_edges = _CASE_TABLE[tmask]  # [C, 6, 2, 3, 2] corner indices (or -1)
    tri_valid = (tri_edges[..., 0, 0] >= 0) & cube_ok[:, None, None]  # [C,6,2]

    ca = jnp.clip(tri_edges[..., 0], 0, 3)  # [C,6,2,3]
    cb = jnp.clip(tri_edges[..., 1], 0, 3)
    corner_a = jnp.take_along_axis(
        tets[None, :, None, None, :].repeat(C, 0), ca[..., None], axis=-1
    )[..., 0]  # cube-corner index of edge endpoint a  [C,6,2,3]
    corner_b = jnp.take_along_axis(
        tets[None, :, None, None, :].repeat(C, 0), cb[..., None], axis=-1
    )[..., 0]

    def gather_corner(data, corner):
        return jnp.take_along_axis(
            data[:, None, None, :].repeat(6, 1).repeat(2, 2), corner, axis=-1
        )

    va = gather_corner(cv, corner_a)  # [C,6,2,3]
    vb = gather_corner(cv, corner_b)
    pa = corner_pos[
        jnp.arange(C)[:, None, None, None], corner_a
    ].astype(jnp.float32)  # [C,6,2,3,3]
    pb = corner_pos[jnp.arange(C)[:, None, None, None], corner_b].astype(jnp.float32)

    denom = vb - va
    t = jnp.where(jnp.abs(denom) > 1e-12, (iso - va) / denom, 0.5)
    t = jnp.clip(t, 0.0, 1.0)
    pos = pa + t[..., None] * (pb - pa)  # [C,6,2,3,3] grid units (slab-local z)
    pos = pos.at[..., 2].add(jnp.asarray(z0, jnp.float32))

    # global integer coordinates of the edge endpoints (int64 keys built on
    # the host to avoid int32 overflow on large grids)
    ga = pa.astype(jnp.int32).at[..., 2].add(z0)
    gb = pb.astype(jnp.int32).at[..., 2].add(z0)

    M = C * 6 * 2 * 3
    return (
        pos.reshape(M, 3),
        ga.reshape(M, 3),
        gb.reshape(M, 3),
        tri_valid.reshape(-1),
    )


def marching_tetrahedra(
    values: np.ndarray,
    iso: float = 0.0,
    weight: Optional[np.ndarray] = None,
    min_weight: float = 0.0,
    origin=np.zeros(3),
    voxel_size: float = 1.0,
    slab: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (vertices, faces) from a dense scalar field.

    Host driver: z-slab jitted kernels -> compact -> dedup edge-keyed
    vertices -> orient triangles along +gradient (outward for TSDF).
    """
    values = np.asarray(values, np.float32)
    if weight is None:
        weight_arr = np.ones_like(values)
    else:
        weight_arr = np.asarray(weight, np.float32)
    X, Y, Z = values.shape

    all_pos = []
    all_keys = []
    for z0 in range(0, Z - 1, slab):
        dz = min(slab, Z - 1 - z0)
        vals = jnp.asarray(values[:, :, z0 : z0 + dz + 1])
        ws = jnp.asarray(weight_arr[:, :, z0 : z0 + dz + 1])
        if dz != slab:  # pad last slab to keep one compiled shape
            pad = slab - dz
            vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad)), constant_values=1e9)
            ws = jnp.pad(ws, ((0, 0), (0, 0), (0, pad)), constant_values=-1.0)
        pos, ga, gb, valid = _slab_triangles(vals, ws, z0, iso, float(min_weight))
        count = int(jnp.sum(valid))
        if count == 0:
            continue
        # compact ON DEVICE before downloading: the candidate soup is
        # ~50-100x larger than the surface triangles, and device->host
        # transfers ride the relay on remote-attached TPUs. argsort puts
        # valid triangles first (stable); the download length is bucketed
        # so slab shapes stay few.
        n_tri = valid.shape[0]
        k = 1024
        while k < count:
            k *= 2
        k = min(k, n_tri)
        sel = jnp.argsort(~valid)[:k]
        vidx = (sel[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
        all_pos.append(np.asarray(pos[vidx])[: 3 * count])

        def flat64(gsel):
            g = np.asarray(gsel, np.int64)[: 3 * count]
            return (g[:, 0] * Y + g[:, 1]) * np.int64(Z + 1) + g[:, 2]

        ia, ib = flat64(ga[vidx]), flat64(gb[vidx])
        all_keys.append(
            np.stack([np.minimum(ia, ib), np.maximum(ia, ib)], axis=1)
        )

    if not all_pos:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    pos = np.concatenate(all_pos)  # [3*T, 3]
    keys = np.concatenate(all_keys)
    key1d = keys[:, 0] * np.int64(X * Y * (Z + 1) + 1) + keys[:, 1]
    uniq, inverse = np.unique(key1d, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float32)
    verts[inverse] = pos  # representatives (identical positions per edge)
    faces = inverse.reshape(-1, 3).astype(np.int32)

    # drop degenerate triangles (two vertices on the same edge)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # orient along the field gradient (positive side = outside for TSDF)
    grad = np.stack(np.gradient(values), axis=-1)  # [X,Y,Z,3]
    centroids = verts[faces].mean(axis=1)
    ci = np.clip(np.round(centroids).astype(int), 0, [X - 1, Y - 1, Z - 1])
    g = grad[ci[:, 0], ci[:, 1], ci[:, 2]]
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    flip = (n * g).sum(-1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    verts_world = np.asarray(origin)[None, :] + verts * voxel_size
    return verts_world.astype(np.float32), faces
