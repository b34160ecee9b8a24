"""Model attribute store, PLY round-trip, camera matrix tests."""

import math
import numpy as np
import jax.numpy as jnp
import pytest

from gaustudio_tpu import models, renderers
from gaustudio_tpu.cameras import Camera, getProjectionMatrix, getWorld2View2
from gaustudio_tpu.utils import ply as plyio


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    props = {
        "x": rng.normal(size=10).astype(np.float32),
        "y": rng.normal(size=10).astype(np.float32),
        "z": rng.normal(size=10).astype(np.float32),
        "red": rng.integers(0, 255, 10).astype(np.uint8),
    }
    p = str(tmp_path / "t.ply")
    plyio.write_ply(p, props)
    back = plyio.read_ply(p)["vertex"]
    for k in props:
        np.testing.assert_array_equal(back[k], props[k])


def test_vanilla_model_create_export_load(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.uniform(size=(50, 3)).astype(np.float32)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(xyz=xyz, rgb=rgb)
    assert pcd.num_points == 50
    assert pcd._f_rest.shape == (50, 45)
    assert np.all(np.asarray(pcd.get_opacity) > 0.099)
    p = str(tmp_path / "point_cloud.ply")
    pcd.export(p)

    pcd2 = models.make({"name": "vanilla_pcd"})
    pcd2.load(p)
    np.testing.assert_allclose(np.asarray(pcd2._xyz), xyz, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pcd2._f_dc), np.asarray(pcd._f_dc), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pcd2._scale), np.asarray(pcd._scale), rtol=1e-6)
    feats = np.asarray(pcd2.get_features)
    assert feats.shape == (50, 16, 3)


def test_vanilla_features_layout():
    """get_features must un-scramble the channel-major on-disk layout."""
    pcd = models.make({"name": "vanilla_pcd"})
    n = 2
    f_rest = np.zeros((n, 45), np.float32)
    # channel-major: coefficient (band k=0 -> f_rest index c*15+0)
    f_rest[:, 0 * 15 + 0] = 1.0  # R channel, first rest band
    f_rest[:, 1 * 15 + 0] = 2.0  # G channel
    f_rest[:, 2 * 15 + 0] = 3.0  # B channel
    pcd.create_from_attribute(xyz=np.zeros((n, 3), np.float32), scale=np.ones((n, 3), np.float32))
    pcd._f_rest = f_rest
    feats = np.asarray(pcd.get_features)
    np.testing.assert_allclose(feats[:, 1, :], [[1.0, 2.0, 3.0]] * n)


def test_model_add():
    a = models.make({"name": "general_pcd"})
    a.create_from_attribute(xyz=np.zeros((3, 3)), rgb=np.ones((3, 3)), normal=np.zeros((3, 3)))
    b = models.make({"name": "general_pcd"})
    b.create_from_attribute(xyz=np.ones((2, 3)), rgb=np.ones((2, 3)), normal=np.zeros((2, 3)))
    c = a + b
    assert c.num_points == 5
    assert np.asarray(c._xyz).shape == (5, 3)


def _look_at_camera(w=64, h=48):
    R = np.eye(3)
    T = np.array([0.0, 0.0, 4.0])
    return Camera(R=R, T=T, FoVx=1.2, FoVy=1.0, image_width=w, image_height=h)


def test_camera_matrices():
    cam = _look_at_camera()
    # camera center = -R @ T for W2V [R|t]
    np.testing.assert_allclose(cam.camera_center, [0, 0, -4.0], atol=1e-6)
    # full proj = W2V^T @ P^T (transposed convention)
    w2v = getWorld2View2(cam.R, cam.T)
    P = getProjectionMatrix(cam.znear, cam.zfar, cam.FoVx, cam.FoVy, 64, 48, (0.5, 0.5))
    np.testing.assert_allclose(cam.full_proj_transform, (P @ w2v).T, atol=1e-5)
    # a point at origin projects to image center
    p = np.array([[0.0, 0.0, 0.0, 1.0]]) @ cam.full_proj_transform
    ndc = p[0, :3] / p[0, 3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)
    K = cam.intrinsics
    assert abs(K[0, 0] - 64 / (2 * math.tan(0.6))) < 1e-4


def test_camera_depth2point_roundtrip():
    cam = _look_at_camera()
    # plane at world z=0 -> camera depth 4 ; check world reprojection
    depth = np.full((48, 64), 4.0, np.float32)
    # depth2point uses ndc convention: z coord in the grid is metric depth
    world = np.asarray(cam.depth2point(jnp.asarray(depth), coordinate="world"))
    np.testing.assert_allclose(world[..., 2], 0.0, atol=1e-5)
    cam_pts = np.asarray(cam.depth2point(jnp.asarray(depth), coordinate="camera"))
    np.testing.assert_allclose(cam_pts[..., 2], 4.0, atol=1e-6)


def test_camera_depth2normal_plane():
    cam = _look_at_camera()
    depth = np.full((48, 64), 4.0, np.float32)
    n = np.asarray(cam.depth2normal(jnp.asarray(depth), coordinate="camera"))
    inner = n[2:-2, 2:-2]
    # plane facing the camera: normal ~ (0,0,-1) or (0,0,1) consistently
    assert np.allclose(np.abs(inner[..., 2]), 1.0, atol=1e-4)


def test_camera_inside_view():
    cam = _look_at_camera()
    pts = jnp.asarray(np.array([[0, 0, 0.0], [100, 0, 0.0], [0, 0, -10.0]], np.float32))
    inside = np.asarray(cam.insideView(pts))
    assert inside[0] and not inside[1] and not inside[2]


def test_camera_pytree():
    import jax
    cam = _look_at_camera()
    leaves = jax.tree.leaves(cam)
    assert len(leaves) >= 5
    cam2 = jax.tree.map(lambda x: x, cam)
    np.testing.assert_allclose(cam2.full_proj_transform, cam.full_proj_transform)


def test_renderer_smoke_with_model():
    rng = np.random.default_rng(3)
    pcd = models.make({"name": "vanilla_pcd"})
    xyz = rng.normal(size=(64, 3)).astype(np.float32) * 0.3
    rgb = rng.uniform(size=(64, 3)).astype(np.float32)
    pcd.create_from_attribute(xyz=xyz, rgb=rgb)
    pcd.active_sh_degree = 3
    cam = _look_at_camera()
    r = renderers.make({"name": "vanilla_renderer"})
    out = r.render(cam, pcd)
    img = np.asarray(out["render"])
    assert img.shape == (3, 48, 64)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
    assert np.asarray(out["visibility_filter"]).sum() > 10
