"""Initializer registry tests."""

import os
import numpy as np
import pytest

from gaustudio_tpu import models
from gaustudio_tpu.cameras import camera_paths
from gaustudio_tpu.pipelines import initializers
from gaustudio_tpu.utils.ply import store_ply


def test_registry_names():
    for name in ["pcd", "depth", "mesh", "voxel", "tsdf", "VisualHull",
                 "gaussiansky", "multigaussiansky", "colmap", "hloc",
                 "loftr", "dust3r"]:
        assert name in initializers._registry, name


def test_pcd_initializer(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = (rng.uniform(size=(100, 3)) * 255).astype(np.uint8)
    normals = rng.normal(size=(100, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    p = str(tmp_path / "cloud.ply")
    store_ply(p, xyz, rgb, normals)

    init = initializers.make({"name": "pcd", "model_path": p})
    model = init(models.make({"name": "vanilla_pcd"}))
    assert model.num_points == 100
    np.testing.assert_allclose(np.asarray(model._xyz), xyz, rtol=1e-6)
    # normals became unit quaternions
    q = np.asarray(model._rot)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=2e-2)


def test_gaussiansky_initializer():
    init = initializers.make({"name": "gaussiansky", "resolution": 20,
                              "radius": 50.0})
    model = init(models.make({"name": "vanilla_pcd"}))
    assert model.num_points == 400
    r = np.linalg.norm(np.asarray(model._xyz), axis=1)
    np.testing.assert_allclose(r, 50.0, rtol=1e-4)

    multi = initializers.make({"name": "multigaussiansky", "resolution": 10,
                               "radii": [10.0, 20.0]})
    model2 = multi(models.make({"name": "vanilla_pcd"}))
    assert model2.num_points == 200


def _box_mesh():
    # unit cube surface
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int64)
    return v, f


@pytest.mark.parametrize("npg", [1, 3, 4, 6])
def test_mesh_initializer(npg):
    v, f = _box_mesh()
    init = initializers.make({"name": "mesh", "n_gaussians_per_triangle": npg})
    model = init(models.make({"name": "vanilla_pcd"}), mesh=(v, f))
    assert model.num_points == len(f) * npg
    # all points on the cube surface
    pts = np.asarray(model._xyz)
    on_face = ((np.abs(pts) < 1e-5) | (np.abs(pts - 1) < 1e-5)).any(axis=1)
    assert on_face.all()
    # flat z scale
    scales = np.asarray(model._scale)
    assert (scales[:, 2] < -10).all()


def test_voxel_initializer():
    v, f = _box_mesh()
    init = initializers.make({"name": "voxel", "voxel_size": 0.25})
    model = init(models.make({"name": "vanilla_pcd"}), mesh=(v, f))
    assert model.num_points > 50
    pts = np.asarray(model._xyz)
    assert pts.min() > -0.3 and pts.max() < 1.3


def test_visual_hull_initializer():
    cams = camera_paths.get_path_from_orbit(np.zeros(3), 3.0, num_cam=8,
                                            image_size=64, fov_deg=40)
    # circular masks => hull approximates a sphere
    yy, xx = np.mgrid[0:64, 0:64]
    mask = (((xx - 32) ** 2 + (yy - 32) ** 2) < 20**2).astype(np.float32)
    for c in cams:
        c.mask = mask
    init = initializers.make({"name": "VisualHull", "resolution": 48,
                              "radius_scale": 0.4})
    model = init(models.make({"name": "vanilla_pcd"}), cams)
    assert model.num_points > 100
    r = np.linalg.norm(np.asarray(model._xyz), axis=1)
    assert r.max() < 2.0


def test_dust3r_external_model_gated(tmp_path):
    """Without mini_dust3r installed, the initializer preprocesses views
    natively then raises ImportError at the delegated inference step."""
    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=3,
                                            image_size=32, fov_deg=50)
    for c in cams:
        c.image = np.zeros((c.image_height, c.image_width, 3), np.float32)
    init = initializers.make({"name": "dust3r",
                              "workspace_dir": str(tmp_path / "ws")})
    with pytest.raises(ImportError):
        init(models.make({"name": "vanilla_pcd"}), cams)
    assert len(init._views) == 3  # native preprocessing ran first


def test_pairs_from_poses_orbit(tmp_path):
    """Sequential window + loop closure on a small orbit ring."""
    from gaustudio_tpu.datasets import utils as dsu
    from gaustudio_tpu.pipelines.initializers import sfm_pairs

    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=12,
                                            image_size=32, fov_deg=50)
    images = {}
    for i, cam in enumerate(cams):
        W2C = cam.extrinsics
        images[i + 1] = dsu.ColmapImage(
            i + 1, dsu.rotmat2qvec(W2C[:3, :3]), W2C[:3, 3], i + 1,
            f"r_{i}.png", np.zeros((0, 2)), np.zeros(0, np.int64),
        )
    pairs = sfm_pairs.pairs_from_poses(images, overlap=3)
    names = [f"r_{i}.png" for i in range(12)]
    # every sequential-window pair is present
    for i in range(11):
        for j in range(i + 1, min(i + 4, 12)):
            assert (names[i], names[j]) in pairs
    # the ring closes: the first image is matched to the last ones via
    # loop closure (they are adjacent in pose space, outside the window)
    assert any(a == "r_0.png" and b in ("r_10.png", "r_11.png")
               for a, b in pairs)
    # no duplicates
    assert len(pairs) == len(set(pairs))

    out = tmp_path / "pairs-sfm.txt"
    sfm_pairs.write_pairs(pairs, out)
    lines = out.read_text().splitlines()
    assert len(lines) == len(pairs) and lines[0] == f"{pairs[0][0]} {pairs[0][1]}"


def test_pairs_near_duplicate_rejected():
    from gaustudio_tpu.datasets import utils as dsu
    from gaustudio_tpu.pipelines.initializers import sfm_pairs

    # two identical poses + one distinct -> the duplicate pair is dropped
    eye_q = np.array([1.0, 0.0, 0.0, 0.0])
    mk = lambda i, t: dsu.ColmapImage(i, eye_q, np.asarray(t, float), i,
                                      f"im{i}.png", np.zeros((0, 2)),
                                      np.zeros(0, np.int64))
    images = {1: mk(1, [0, 0, 0]), 2: mk(2, [0, 0, 0]), 3: mk(3, [1, 0, 0])}
    pairs = sfm_pairs.pairs_from_poses(images, overlap=2)
    assert ("im1.png", "im2.png") not in pairs
    assert ("im1.png", "im3.png") in pairs and ("im2.png", "im3.png") in pairs


def test_hloc_initializer_writes_pairs(tmp_path):
    """The hloc initializer selects pairs natively, then gates matching on
    the external hloc package (absent here -> ImportError after pairs)."""
    from gaustudio_tpu.cameras import Camera

    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=4,
                                            image_size=16, fov_deg=50)
    ws = str(tmp_path / "ws")
    init = initializers.make({"name": "hloc", "workspace_dir": ws})
    init.cache_dataset(cams)
    with pytest.raises(ImportError):
        init.process_dataset()
    pairs_file = tmp_path / "ws" / "pairs-sfm.txt"
    assert pairs_file.exists() and len(pairs_file.read_text().splitlines()) >= 3


def test_dust3r_prepare_view_crop_resize16():
    """prepare_view: crop about the principal point, resize to multiples
    of 16, intrinsics adjusted consistently (reference dust3r.py:89-168)."""
    from gaustudio_tpu.pipelines.initializers.dust3r import prepare_view

    H, W = 100, 160
    img = np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)
    K = np.array([[120.0, 0, 70.0], [0, 118.0, 46.0], [0, 0, 1.0]])
    out_img, out_mask, K2 = prepare_view(img, K, mask=None, image_size=512)
    h2, w2 = out_img.shape[:2]
    assert h2 % 16 == 0 and w2 % 16 == 0
    assert out_img.dtype == np.uint8 and out_mask is None
    # principal point is centered after the symmetric crop + scale
    np.testing.assert_allclose(K2[0, 2] / w2, 0.5, atol=0.02)
    np.testing.assert_allclose(K2[1, 2] / h2, 0.5, atol=0.02)
    # square results get shrunk on one axis
    sq_img = np.zeros((64, 64, 3), np.float32)
    Ks = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]])
    s_img, _, _ = prepare_view(sq_img, Ks, image_size=512)
    assert s_img.shape[0] != s_img.shape[1]


def test_dust3r_select_and_fuse():
    from gaustudio_tpu.pipelines.initializers import dust3r as D

    assert D.select_view_indices(10, 20) == list(range(10))
    idx = D.select_view_indices(100, 20)
    assert len(idx) == 20 and idx[1] - idx[0] == 5

    pts = [np.ones((4, 4, 3), np.float32) * i for i in range(3)]
    cols = [np.full((4, 4, 3), 0.5, np.float32)] * 3
    masks = [np.ones((4, 4), bool), np.zeros((4, 4), bool),
             np.ones((4, 4), bool)]
    xyz, rgb = D.fuse_point_clouds(pts, cols, masks)
    assert xyz.shape == (32, 3) and rgb.shape == (32, 3)  # view 1 skipped
    assert set(np.unique(xyz)) == {0.0, 2.0}
    # downsampling cap
    xyz2, _ = D.fuse_point_clouds(pts, cols, masks, max_points=10)
    assert len(xyz2) <= 16


def test_dust3r_initializer_mocked_model(tmp_path):
    """Full protocol with the external model mocked: cache (crop/resize),
    'inference', fusion to fused.ply, PcdInitializer build."""
    from gaustudio_tpu import models
    from gaustudio_tpu.pipelines.initializers.dust3r import Dust3rInitializer

    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=5,
                                            image_size=64, fov_deg=50)
    for c in cams:
        c.image = np.random.default_rng(1).uniform(
            size=(c.image_height, c.image_width, 3)).astype(np.float32)

    def fake_run(views, poses, intrinsics):
        assert len(views) == 5 and len(poses) == 5
        for v, K in zip(views, intrinsics):
            h, w = v["img_u8"].shape[:2]
            assert h % 16 == 0 and w % 16 == 0
            assert K.shape == (3, 3)
        rng = np.random.default_rng(2)
        pts = [rng.normal(size=v["img_u8"].shape).astype(np.float32)
               for v in views]
        masks = [np.ones(v["img_u8"].shape[:2], bool) for v in views]
        return pts, masks

    init = Dust3rInitializer({"workspace_dir": str(tmp_path / "ws")},
                             run_dust3r=fake_run)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd = init(pcd, cams)
    assert os.path.exists(init.model_path)
    assert pcd._xyz.shape[0] > 100
