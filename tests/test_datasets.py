"""Dataset loader tests with generated fixtures (COLMAP bin/txt, cameras.json,
transforms_train.json) — the format round-trip strategy of SURVEY.md §4.5."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from gaustudio_tpu import datasets
from gaustudio_tpu.datasets import utils as dsu


def _rand_pose(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    qvec = dsu.rotmat2qvec(Q)
    tvec = rng.normal(size=3)
    return qvec, tvec


def _write_image(path, w=32, h=24, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


@pytest.fixture
def colmap_scene(tmp_path):
    rng = np.random.default_rng(0)
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    images = tmp_path / "images"
    images.mkdir()

    cams = {
        1: dsu.ColmapCamera(1, "PINHOLE", 32, 24, np.array([30.0, 31.0, 16.0, 12.0]))
    }
    dsu.write_intrinsics_binary(cams, sparse / "cameras.bin")

    ims = {}
    for i in range(3):
        qvec, tvec = _rand_pose(rng)
        name = f"im_{i:03d}.png"
        ims[i + 1] = dsu.ColmapImage(
            i + 1, qvec, tvec, 1, name,
            np.array([[1.0, 2.0], [3.0, 4.0]]), np.array([7, -1], np.int64),
        )
        _write_image(images / name, seed=i)
    dsu.write_extrinsics_binary(ims, sparse / "images.bin")

    xyz = rng.normal(size=(20, 3))
    rgb = rng.integers(0, 255, size=(20, 3))
    dsu.write_points3D_binary(xyz, rgb, sparse / "points3D.bin")
    return tmp_path, ims, cams, xyz, rgb


def test_colmap_binary_roundtrip(colmap_scene):
    path, ims, cams, xyz, rgb = colmap_scene
    sparse = path / "sparse" / "0"
    cams2 = dsu.read_intrinsics_binary(sparse / "cameras.bin")
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    ims2 = dsu.read_extrinsics_binary(sparse / "images.bin")
    for k in ims:
        np.testing.assert_allclose(ims2[k].qvec, ims[k].qvec)
        np.testing.assert_allclose(ims2[k].tvec, ims[k].tvec)
        np.testing.assert_allclose(ims2[k].xys, ims[k].xys)
        np.testing.assert_array_equal(ims2[k].point3D_ids, ims[k].point3D_ids)
        assert ims2[k].name == ims[k].name
    xyz2, rgb2, err2 = dsu.read_points3D_binary(sparse / "points3D.bin")
    np.testing.assert_allclose(xyz2, xyz, atol=1e-12)
    np.testing.assert_array_equal(rgb2, rgb)


def test_colmap_dataset_loads(colmap_scene):
    path, *_ = colmap_scene
    ds = datasets.make({"name": "colmap", "source_path": str(path)})
    assert len(ds) == 3
    cam = ds[0]
    assert cam.image.shape == (24, 32, 3)
    assert cam.image_width == 32
    assert ds.cameras_extent > 0
    # cameras sorted by name
    names = [c.image_name for c in ds]
    assert names == sorted(names)


def test_cameras_json_roundtrip(colmap_scene, tmp_path):
    path, *_ = colmap_scene
    ds = datasets.make({"name": "colmap", "source_path": str(path)})
    out = tmp_path / "cameras.json"
    ds.export(str(out))
    data = json.loads(out.read_text())
    assert len(data) == 3
    cam0 = ds[0]
    back = dsu.JSON_to_camera(data[0])
    np.testing.assert_allclose(back.R, cam0.R, atol=1e-6)
    np.testing.assert_allclose(back.T, cam0.T, atol=1e-6)
    assert abs(back.FoVx - cam0.FoVx) < 1e-6


def test_vanilla_dataset(colmap_scene, tmp_path):
    path, *_ = colmap_scene
    ds = datasets.make({"name": "colmap", "source_path": str(path)})
    root = tmp_path / "gsout"
    (root / "images").mkdir(parents=True)
    ds.export(str(root / "cameras.json"))
    for c in ds:
        _write_image(root / "images" / c.image_name)
    ds2 = datasets.make({"name": "vanilla", "source_path": str(root)})
    assert len(ds2) == 3
    assert ds2[0].image is not None


def test_nerf_dataset(tmp_path):
    rng = np.random.default_rng(1)
    frames = []
    for i in range(4):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        c2w = np.eye(4)
        c2w[:3, :3] = Q
        c2w[:3, 3] = rng.normal(size=3) * 2
        frames.append({"file_path": f"./train/r_{i}", "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.7, "frames": frames}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
    ds = datasets.make({"name": "nerf", "source_path": str(tmp_path),
                        "load_images": False})
    assert len(ds) == 4
    assert ds[0].image_width == 800
    # camera centers finite and normalization computed
    assert np.isfinite(ds.cameras_extent)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        q = dsu.rotmat2qvec(Q)
        np.testing.assert_allclose(dsu.qvec2rotmat(q), Q, atol=1e-8)


def test_colmap_text_readers(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 SIMPLE_PINHOLE 64 48 50.0 32.0 24.0\n"
    )
    cams = dsu.read_intrinsics_text(tmp_path / "cameras.txt")
    assert cams[1].model == "SIMPLE_PINHOLE" and cams[1].width == 64
    (tmp_path / "images.txt").write_text(
        "# hdr\n1 1 0 0 0 0.5 0.5 0.5 1 a.png\n1.0 2.0 7 3.0 4.0 -1\n"
    )
    ims = dsu.read_extrinsics_text(tmp_path / "images.txt")
    assert ims[1].name == "a.png"
    np.testing.assert_allclose(ims[1].xys, [[1, 2], [3, 4]])


def test_all_reference_formats_registered():
    """Every dataset name the reference registers must exist here
    (SURVEY.md §2.2 dataset loaders row)."""
    expected = [
        "colmap", "vanilla", "nerf", "rtmv", "navi", "kiri", "trellis",
        "nerfstudio", "mushroom", "neus", "nisr", "nero", "nsvf",
        "deepvoxels", "mvsnet", "scannet", "mobilebrick", "polycam", "waymo",
    ]
    for name in expected:
        assert name in datasets._registry, name


def test_nsvf_deepvoxels_loader(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "pose").mkdir()
    (tmp_path / "intrinsics.txt").write_text("100.0 16.0 12.0 0\n")
    for i in range(3):
        img = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "rgb" / f"0_train_{i:04d}.png")
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 2 + i]
        np.savetxt(tmp_path / "pose" / f"0_train_{i:04d}.txt", c2w)
    ds = datasets.make({"name": "nsvf", "source_path": str(tmp_path)})
    assert len(ds) == 3
    assert ds[0].image.shape == (24, 32, 3)
    assert abs(ds[0].intrinsics[0, 0] - 100.0) < 1e-5


def test_nerfstudio_loader(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(1)
    frames = []
    for i in range(3):
        name = f"frame_{i:03d}.png"
        img = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / name)
        c2w = np.eye(4)
        c2w[:3, 3] = [i * 0.3, 0, 2]
        frames.append({
            "file_path": name, "w": 32, "h": 24, "fl_x": 30.0, "fl_y": 30.0,
            "cx": 16.0, "cy": 12.0, "transform_matrix": c2w.tolist(),
        })
    (tmp_path / "transforms.json").write_text(json.dumps({"frames": frames}))
    ds = datasets.make({"name": "nerfstudio", "source_path": str(tmp_path)})
    assert len(ds) == 3
    assert ds[1].image.shape == (24, 32, 3)


def test_scannet_loader(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(2)
    for sub in ["color", "depth", "pose", "intrinsic"]:
        (tmp_path / sub).mkdir()
    intr = np.eye(4); intr[0, 0] = intr[1, 1] = 40.0; intr[0, 2] = 16; intr[1, 2] = 12
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", intr)
    for i in range(2):
        img = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "color" / f"{i}.jpg")
        depth = (rng.uniform(500, 3000, (24, 32))).astype(np.uint16)
        Image.fromarray(depth).save(tmp_path / "depth" / f"{i}.png")
        c2w = np.eye(4); c2w[:3, 3] = [0, 0, i + 1.0]
        np.savetxt(tmp_path / "pose" / f"{i}.txt", c2w)
    ds = datasets.make({"name": "scannet", "source_path": str(tmp_path)})
    assert len(ds) == 2
    assert ds[0].depth is not None
    assert 0.4 < float(np.asarray(ds[0].depth).mean()) < 3.1
