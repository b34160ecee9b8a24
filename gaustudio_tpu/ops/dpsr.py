"""Differentiable Poisson Surface Reconstruction (Shape-As-Points).

Port of gaustudio/utils/graphics_utils.py:19-357 (fftfreqs,
spec_gaussian_filter, grid_interp, point_rasterize, DPSR.forward, PSR2Mesh)
to jnp: oriented points -> spectral Poisson solve (rfftn -> divergence ->
inverse Laplacian -> irfftn with shift/scale normalization) -> indicator
grid -> mesh via marching tetrahedra, with the PSR2Mesh custom VJP
(normal-weighted vertex-gradient scatter, graphics_utils.py:335-357).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fftfreqs(res) -> jnp.ndarray:
    """graphics_utils.py:19-41: [*res_spatial, n_dim] frequency grid with the
    last spatial dim in rfft layout."""
    freqs = [np.fft.fftfreq(r, d=1.0 / r) for r in res[:-1]]
    freqs.append(np.fft.rfftfreq(res[-1], d=1.0 / res[-1]))
    omega = np.stack(np.meshgrid(*freqs, indexing="ij"), axis=-1)
    return jnp.asarray(omega, jnp.float32)


def spec_gaussian_filter(res, sig) -> jnp.ndarray:
    """graphics_utils.py:44-50."""
    omega = fftfreqs(res)
    dis = jnp.sqrt(jnp.sum(omega**2, axis=-1))
    return jnp.exp(-0.5 * ((sig * 2.0 * dis / res[0]) ** 2))


def _corner_data(pts, size):
    """Shared trilinear corner indices/weights (periodic wrap), pts in (0,1)."""
    dim = pts.shape[-1]
    size_f = jnp.asarray(size, jnp.float32)
    cubesize = 1.0 / size_f
    ind0 = jnp.floor(pts / cubesize).astype(jnp.int32)  # [N, dim]
    corners = np.stack(
        np.meshgrid(*([np.array([0, 1])] * dim), indexing="ij"), -1
    ).reshape(-1, dim)  # [2**dim, dim]
    corners = jnp.asarray(corners)
    idx = (ind0[:, None, :] + corners[None]) % jnp.asarray(size)  # [N, 2**dim, dim]
    # weight = prod over dims of (1 - |pts - opposite_corner_pos|/cube)
    corner_pos = (ind0[:, None, :] + corners[None]).astype(jnp.float32) * cubesize
    opp_pos = (ind0[:, None, :] + (1 - corners)[None]).astype(jnp.float32) * cubesize
    w = jnp.prod(jnp.abs(pts[:, None, :] - opp_pos) / cubesize, axis=-1)
    return idx, w, corner_pos


def grid_interp(grid, pts):
    """Trilinear periodic interpolation; graphics_utils.py:69-112.

    grid: [X, Y, Z, F]; pts: [N, 3] in (0,1) -> [N, F]."""
    size = grid.shape[:-1]
    idx, w, _ = _corner_data(pts, size)
    vals = grid[idx[..., 0], idx[..., 1], idx[..., 2]]  # [N, 8, F]
    return jnp.sum(vals * w[..., None], axis=-2)


def point_rasterize(pts, vals, size, weighted: bool = False):
    """Trilinear scatter of point values to a grid
    (graphics_utils.py:157-217): [N,3],[N,F] -> [F, *size]."""
    nf = vals.shape[-1]
    idx, w, _ = _corner_data(pts, size)  # [N,8,3], [N,8]
    flat = (idx[..., 0] * size[1] + idx[..., 1]) * size[2] + idx[..., 2]  # [N,8]
    contrib = w[..., None] * vals[:, None, :]  # [N,8,F]
    total = int(np.prod(size))
    out = jnp.zeros((total, nf), vals.dtype).at[flat.reshape(-1)].add(
        contrib.reshape(-1, nf)
    )
    if weighted:
        cnt = jnp.zeros((total,), vals.dtype).at[flat.reshape(-1)].add(
            jnp.ones_like(w).reshape(-1)
        )
        out = out / jnp.where(cnt == 0, 1.0, cnt)[:, None]
    out = out.reshape(*size, nf)
    return jnp.moveaxis(out, -1, 0)  # [F, *size]


def dpsr_solve(points, normals, res: Tuple[int, int, int], sig: float = 10.0,
               scale: bool = True, shift: bool = True, weighted: bool = False):
    """Spectral Poisson solve (DPSR.forward, graphics_utils.py:287-333).

    points [N,3] in (0,1), normals [N,3] -> indicator grid [*res], negative
    inside (matching the reference's -phi scaling).
    """
    ras = point_rasterize(points, normals, res, weighted=weighted)  # [3, X,Y,Z]
    ras_hat = jnp.fft.rfftn(ras, axes=(1, 2, 3))  # [3, X, Y, Zr]
    ras_hat = jnp.moveaxis(ras_hat, 0, -1)  # [X, Y, Zr, 3]
    G = spec_gaussian_filter(res, sig)  # [X, Y, Zr]
    N_hat = ras_hat * G[..., None]

    omega = fftfreqs(res) * (2.0 * np.pi)  # [X, Y, Zr, 3]
    # DivN = sum_d (-i * omega_d) * N_d
    DivN = jnp.sum(-1j * omega * N_hat, axis=-1)
    Lap = -jnp.sum(omega**2, axis=-1)
    Phi = DivN / (Lap + 1e-6)
    Phi = Phi.at[0, 0, 0].set(0.0)
    phi = jnp.fft.irfftn(Phi, s=res, axes=(0, 1, 2)).astype(jnp.float32)

    if shift or scale:
        fv = grid_interp(phi[..., None], points)[:, 0]
        if shift:
            phi = phi - jnp.mean(fv)
        fv0 = jax.lax.stop_gradient(phi[0, 0, 0])
        if scale:
            phi = -phi / jnp.abs(fv0) * 0.5
    return phi


@jax.custom_vjp
def psr_to_mesh_grid_grad(psr_grid, verts_unit, normals):
    """Identity on (verts); exists to carry the PSR2Mesh backward rule:
    dL/dgrid = rasterize(verts, -normals * dL/dverts)
    (graphics_utils.py:335-357)."""
    return verts_unit


def _p2m_fwd(psr_grid, verts_unit, normals):
    return verts_unit, (psr_grid.shape, verts_unit, normals)


def _p2m_bwd(res, g):
    shape, verts_unit, normals = res
    # grad w.r.t. each vertex flows into the grid via the surface normal
    grad_vert = jnp.sum(g * (-normals), axis=-1, keepdims=True)  # [V,1]
    grad_grid = point_rasterize(verts_unit, grad_vert, shape)[0]
    return grad_grid, None, None


psr_to_mesh_grid_grad.defvjp(_p2m_fwd, _p2m_bwd)


def mc_from_psr(psr_grid, zero_level: float = 0.0):
    """Indicator grid -> (verts in (0,1), faces, vertex normals); host-side
    marching (graphics_utils.py:239-284) via marching tetrahedra."""
    from gaustudio_tpu.ops.mcubes import marching_tetrahedra

    grid = np.asarray(psr_grid)
    res = grid.shape
    verts, faces = marching_tetrahedra(grid, iso=zero_level, voxel_size=1.0)
    verts_unit = verts / np.asarray(res, np.float32)
    # vertex normals from face normals
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)
    vn = np.zeros_like(verts)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
    return verts_unit.astype(np.float32), faces, vn.astype(np.float32)
