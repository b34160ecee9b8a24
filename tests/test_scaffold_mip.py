"""Scaffold + mip model/renderer smoke tests."""

import pytest
import numpy as np
import jax.numpy as jnp

from gaustudio_tpu import models, renderers
from gaustudio_tpu.cameras import Camera


def _cam(w=48, h=48):
    return Camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]), FoVx=1.0, FoVy=1.0,
                  image_width=w, image_height=h)


def test_scaffold_model_and_renderer():
    rng = np.random.default_rng(0)
    model = models.make({"name": "scaffold_pcd", "n_offsets": 4,
                         "voxel_size": 0.1})
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 0.4
    model.create_from_attribute(xyz=pts)
    assert model.num_points > 10
    # offsets get some spread so gaussians aren't all at anchors
    model._offset = rng.normal(size=model._offset.shape).astype(np.float32) * 0.1
    model._anchor_feat = rng.normal(size=model._anchor_feat.shape).astype(np.float32)

    r = renderers.make({"name": "scaffold_renderer"})
    out = r.render(_cam(), model)
    img = np.asarray(out["render"])
    assert img.shape == (3, 48, 48)
    assert np.isfinite(img).all()


def test_scaffold_voxelize():
    model = models.make({"name": "scaffold_pcd", "voxel_size": 0.5})
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 0, 0]], np.float32)
    v = model.voxelize_sample(pts, 0.5)
    assert len(v) == 2


def test_mip_filter_and_render():
    rng = np.random.default_rng(1)
    pcd = models.make({"name": "mip_pcd"})
    n = 60
    pcd.create_from_attribute(
        xyz=rng.normal(size=(n, 3)).astype(np.float32) * 0.3,
        rgb=rng.uniform(size=(n, 3)).astype(np.float32),
    )
    pcd.active_sh_degree = 0
    cam = _cam()
    f = pcd.compute_3D_filter([cam])
    assert f.shape == (n, 1)
    assert (f > 0).all()
    # filtered opacity <= raw opacity
    raw = np.asarray(pcd.get_attribute("opacity"))
    filt = np.asarray(pcd.get_opacity_with_3D_filter)
    assert (filt <= raw + 1e-6).all()
    # filtered scales >= raw scales
    s_raw = np.exp(np.asarray(pcd._scale))
    s_f = np.asarray(pcd.get_scaling_with_3D_filter)
    assert (s_f >= s_raw - 1e-6).all()

    r = renderers.make({"name": "mip_renderer"})
    out = r.render(cam, pcd)
    assert np.isfinite(np.asarray(out["render"])).all()


@pytest.mark.slow
def test_gsplat_antialiased_renderer():
    """gsplat backend = antialiased mode: the 0.3-px low-pass compensation
    dims sub-pixel splats (ref gsplat project_gaussians' compensation
    output, gaustudio/renderers/gsplat_renderer.py:46-60) while leaving
    large splats nearly untouched, and an alpha map is returned."""
    rng = np.random.default_rng(2)
    n = 80
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    rgb = rng.uniform(0.3, 1.0, size=(n, 3)).astype(np.float32)

    def build(scale):
        pcd = models.make({"name": "vanilla_pcd"})
        pcd.create_from_attribute(xyz=xyz, rgb=rgb)
        pcd.active_sh_degree = 0
        pcd._scale = np.full((n, 3), np.log(scale), np.float32)
        return pcd

    cam = _cam()
    van = renderers.make({"name": "vanilla_renderer"})
    gs = renderers.make({"name": "gsplat_renderer"})

    tiny = build(2e-3)  # sub-pixel splats: compensation should bite hard
    img_v = np.asarray(van.render(cam, tiny)["render"])
    out_g = gs.render(cam, tiny)
    img_g = np.asarray(out_g["render"])
    assert np.isfinite(img_g).all()
    assert "rendered_final_opacity" in out_g
    assert img_g.sum() < 0.6 * img_v.sum()

    big = build(0.3)  # many-pixel splats: compensation ~1
    img_v = np.asarray(van.render(cam, big)["render"])
    img_g = np.asarray(gs.render(cam, big)["render"])
    assert np.abs(img_g - img_v).max() < 0.05


def test_gsplat_intrinsics_projection_matches_tanfov():
    """The gsplat intrinsics projection path (fx,fy,cx,cy from
    camera.intrinsics -> gaussian.preprocess intrinsics mode) must agree
    with the tanfov/projmatrix path, for centered AND off-center principal
    points (ref gaustudio/renderers/gsplat_renderer.py:38-49)."""
    rng = np.random.default_rng(3)
    n = 60
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=rng.normal(size=(n, 3)).astype(np.float32) * 0.3,
        rgb=rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32),
    )
    pcd.active_sh_degree = 0

    van = renderers.make({"name": "vanilla_renderer"})
    # isolate the projection mode: disable the other gsplat semantics
    gs = renderers.make({"name": "gsplat_renderer", "antialias": False,
                         "convert_SHs_python": False})

    for ppx, ppy in [(0.5, 0.5), (0.62, 0.41)]:
        cam = Camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]), FoVx=1.0,
                     FoVy=1.0, image_width=48, image_height=48,
                     principal_point_ndc=(ppx, ppy))
        img_v = np.asarray(van.render(cam, pcd)["render"])
        img_g = np.asarray(gs.render(cam, pcd)["render"])
        assert img_v.sum() > 1.0  # scene actually visible
        np.testing.assert_allclose(img_g, img_v, atol=1e-4,
                                   err_msg=f"pp=({ppx},{ppy})")

    # the off-center pp must actually move the image (the intrinsics are
    # not silently ignored)
    cam_c = Camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]), FoVx=1.0,
                   FoVy=1.0, image_width=48, image_height=48)
    cam_o = Camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]), FoVx=1.0,
                   FoVy=1.0, image_width=48, image_height=48,
                   principal_point_ndc=(0.7, 0.5))
    a = np.asarray(gs.render(cam_c, pcd)["render"])
    b = np.asarray(gs.render(cam_o, pcd)["render"])
    assert np.abs(a - b).max() > 1e-3
