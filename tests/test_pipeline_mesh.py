"""End-to-end gs-extract-mesh pipeline test on a synthetic Gaussian sphere."""

import numpy as np
import pytest

from gaustudio_tpu import models, renderers
from gaustudio_tpu.cameras import camera_paths
from gaustudio_tpu.pipelines.mesh_extraction import extract_mesh


@pytest.fixture(scope="module")
def sphere_scene():
    rng = np.random.default_rng(0)
    n = 3000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    xyz = (dirs * 0.4).astype(np.float32)
    rgb = (dirs * 0.5 + 0.5).astype(np.float32)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(xyz=xyz, rgb=rgb)
    # opaque-ish surface
    pcd._opacity = np.full((n, 1), 3.0, np.float32)  # sigmoid -> 0.95
    pcd.active_sh_degree = 0
    return pcd


def test_extract_mesh_sphere(sphere_scene, tmp_path):
    cams = camera_paths.get_path_from_orbit(
        np.zeros(3), 1.6, elevation=15, num_cam=12, image_size=128, fov_deg=60
    )
    renderer = renderers.make({"name": "vanilla_renderer"})
    verts, faces = extract_mesh(
        sphere_scene, renderer, cams,
        work_dir=str(tmp_path),
        voxel_size=0.02, sdf_trunc=0.08, min_weight=2.0,
        stride=1, downsample=1, max_dim=128,
    )
    assert len(verts) > 300
    assert len(faces) > 300
    radii = np.linalg.norm(verts, axis=1)
    # surface near the gaussian shell radius 0.4 (within a few voxels)
    assert abs(np.median(radii) - 0.4) < 0.08
    # outputs on disk
    import os
    assert os.path.exists(tmp_path / "fused_mesh.ply")
    pngs = list((tmp_path / "images").glob("*.png"))
    cams_files = list((tmp_path / "images").glob("*.cam"))
    assert len(pngs) == 12 and len(cams_files) == 12
    assert len(list((tmp_path / "masks").glob("*.png"))) == 12


@pytest.mark.slow
def test_extract_mesh_mixed_fov(sphere_scene, tmp_path):
    """Mixed camera models in one capture (same W/H, different FoV): the
    camera-DP path must group per-FoV (its jitted closure bakes cam0's
    tanfov) and number view files globally (regression: per-group
    numbering collided and overwrote files)."""
    cams = camera_paths.get_path_from_orbit(
        np.zeros(3), 1.6, elevation=15, num_cam=6, image_size=96, fov_deg=60
    ) + camera_paths.get_path_from_orbit(
        np.zeros(3), 1.6, elevation=40, num_cam=6, image_size=96, fov_deg=40
    )
    # both orbit paths name their cameras "0".."5"; clear the names so the
    # pipeline's global-index fallback naming is what's under test
    for c in cams:
        c.image_name = None
    renderer = renderers.make({"name": "vanilla_renderer"})
    verts, faces = extract_mesh(
        sphere_scene, renderer, cams,
        work_dir=str(tmp_path),
        voxel_size=0.02, sdf_trunc=0.08, min_weight=2.0,
        stride=1, downsample=1, max_dim=128,
    )
    assert len(verts) > 300 and len(faces) > 300
    radii = np.linalg.norm(verts, axis=1)
    assert abs(np.median(radii) - 0.4) < 0.08
    # every view produced distinct files (no cross-group collisions)
    assert len(list((tmp_path / "images").glob("*.png"))) == 12
    assert len(list((tmp_path / "images").glob("*.cam"))) == 12


def test_camera_paths_tools():
    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=12,
                                            image_size=64)
    assert len(cams) == 12
    # all look at origin: camera centers at radius 2
    for c in cams:
        np.testing.assert_allclose(np.linalg.norm(c.camera_center), 2.0, rtol=1e-5)

    cube = camera_paths.get_path_from_cubemap(np.zeros(3), 1.5, image_size=64)
    assert len(cube) == 6

    valid = camera_paths.validate_paths(cams)
    assert len(valid) >= 10

    smooth = camera_paths.smoothen_cameras(cams)
    assert len(smooth) == len(cams)

    up = camera_paths.upsample_cameras_velocity(cams, meters_per_frame=0.2,
                                                angles_per_frame=5)
    assert len(up) > len(cams) - 1

    down = camera_paths.downsample_cameras(cams, translation_threshold=0.5,
                                           rotation_threshold=5, min_samples=2)
    assert 2 <= len(down) <= len(cams)
