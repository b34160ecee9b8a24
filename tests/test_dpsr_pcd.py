"""DPSR (Shape-As-Points) and surface-extraction pipeline tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaustudio_tpu.ops import dpsr


def _sphere_points(n=4000, r=0.25, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = 0.5 + d * r
    return pts.astype(np.float32), d.astype(np.float32)


def test_dpsr_sphere_indicator():
    pts, normals = _sphere_points()
    phi = np.asarray(dpsr.dpsr_solve(jnp.asarray(pts), jnp.asarray(normals),
                                     (64, 64, 64), sig=2.0))
    assert phi.shape == (64, 64, 64)
    # center inside (negative), corner outside (positive)
    assert phi[32, 32, 32] < 0
    assert phi[2, 2, 2] > 0
    # zero crossing near radius 0.25
    lin = (np.arange(64) + 0.0) / 64
    row = phi[:, 32, 32]
    crossings = np.where(np.sign(row[:-1]) != np.sign(row[1:]))[0]
    radii = np.abs(lin[crossings] - 0.5)
    assert np.any(np.abs(radii - 0.25) < 0.05)


def test_dpsr_mesh_roundtrip():
    pts, normals = _sphere_points()
    phi = dpsr.dpsr_solve(jnp.asarray(pts), jnp.asarray(normals), (64, 64, 64),
                          sig=2.0)
    verts, faces, vnorm = dpsr.mc_from_psr(np.asarray(phi))
    assert len(verts) > 200
    r = np.linalg.norm(verts - 0.5, axis=1)
    np.testing.assert_allclose(np.median(r), 0.25, atol=0.03)
    # vertex normals roughly radial
    d = (verts - 0.5) / np.maximum(r[:, None], 1e-9)
    align = np.abs((vnorm * d).sum(1))
    assert np.median(align) > 0.9


def test_point_rasterize_grid_interp_adjointness():
    """<rasterize(p, v), g> == <v, interp(g, p)> (trilinear scatter/gather
    are transposes of each other)."""
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0.1, 0.9, (50, 3)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(50, 2)).astype(np.float32))
    grid = jnp.asarray(rng.normal(size=(16, 16, 16, 2)).astype(np.float32))
    ras = dpsr.point_rasterize(pts, vals, (16, 16, 16))  # [2,16,16,16]
    lhs = float(jnp.sum(jnp.moveaxis(ras, 0, -1) * grid))
    interp = dpsr.grid_interp(grid, pts)  # [50, 2]
    rhs = float(jnp.sum(interp * vals))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_sap_model():
    from gaustudio_tpu.models.sap import ShapeAsPoints

    pts, normals = _sphere_points(2000)
    world_pts = (pts - 0.5) * 4.0 + np.array([1.0, 2.0, 3.0])
    sap = ShapeAsPoints.from_pointcloud(world_pts, normals,
                                        {"grid_res": 64, "psr_sigma": 2.0})
    verts, faces = sap.generate_mesh()
    assert len(verts) > 100
    r = np.linalg.norm(verts - np.array([1.0, 2.0, 3.0]), axis=1)
    np.testing.assert_allclose(np.median(r), 1.0, atol=0.15)


def test_masked_bilateral_filter():
    from gaustudio_tpu.pipelines.pcd_extraction import masked_bilateral_filter

    rng = np.random.default_rng(2)
    depth = np.full((32, 32), 2.0, np.float32) + rng.normal(size=(32, 32)).astype(np.float32) * 0.01
    mask = np.ones((32, 32), bool)
    mask[:8] = False
    filt, new_mask = masked_bilateral_filter(depth, mask)
    assert new_mask.sum() < mask.sum()  # eroded
    inner = filt[12:28, 8:24]
    assert abs(inner.mean() - 2.0) < 0.02
    assert inner.std() <= depth[12:28, 8:24].std() + 1e-6


def test_normal_fusion():
    from gaustudio_tpu.pipelines.pcd_extraction import normal_fusion
    from gaustudio_tpu.cameras import Camera

    class FakePcd:
        _xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)

    cams = [
        Camera(R=np.eye(3), T=np.array([0.0, 0, 3]), FoVx=1.0, FoVy=1.0,
               image_width=16, image_height=16)
        for _ in range(2)
    ]
    n = np.array([[0, 0, -1.0]], np.float32)
    ids = [np.array([0, 1]), np.array([0, 2])]
    normals = [np.repeat(n, 2, 0), np.repeat(n, 2, 0) + 0.01]
    conf = [np.ones(2, np.float32), np.ones(2, np.float32)]
    uids, fused = normal_fusion(FakePcd(), ids, normals, conf, cams, knn=2)
    assert list(uids) == [0, 1, 2]
    np.testing.assert_allclose(np.linalg.norm(fused, axis=1), 1.0, atol=1e-5)
    assert (fused[:, 2] < -0.9).all()
