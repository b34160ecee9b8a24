"""CLI entry-point smoke tests (run via main() with argv patching)."""

import json
import os
import sys

import numpy as np
import pytest

from gaustudio_tpu import models, renderers
from gaustudio_tpu.cameras import camera_paths
from gaustudio_tpu.utils.mesh import save_mesh


def _run_main(module, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        module.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory):
    """A fake trained-model directory in the Inria layout."""
    root = tmp_path_factory.mktemp("model")
    rng = np.random.default_rng(0)
    n = 400
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pcd = models.make({"name": "vanilla_pcd"})
    pcd.create_from_attribute(
        xyz=(dirs * 0.4).astype(np.float32),
        rgb=rng.uniform(size=(n, 3)).astype(np.float32),
    )
    pcd._opacity = np.full((n, 1), 3.0, np.float32)
    out = root / "point_cloud" / "iteration_100"
    out.mkdir(parents=True)
    pcd.export(str(out / "point_cloud.ply"))

    cams = camera_paths.get_path_from_orbit(np.zeros(3), 1.8, num_cam=6,
                                            image_size=64, fov_deg=60)
    from gaustudio_tpu.datasets.utils import camera_to_JSON

    (root / "cameras.json").write_text(
        json.dumps([camera_to_JSON(i, c) for i, c in enumerate(cams)])
    )
    return str(root)


def test_gs_render_cli(trained_model_dir, tmp_path):
    from gaustudio_tpu.scripts import render

    out = str(tmp_path / "renders")
    _run_main(render, ["-m", trained_model_dir, "-o", out, "--sh", "0"])
    pngs = [f for f in os.listdir(os.path.join(out, "images")) if f.endswith(".png")]
    assert len(pngs) == 6


def test_gs_extract_mesh_cli(trained_model_dir, tmp_path):
    from gaustudio_tpu.scripts import extract_mesh

    out = str(tmp_path / "mesh")
    _run_main(
        extract_mesh,
        ["-m", trained_model_dir, "-o", out, "--sh", "0", "--stride", "2",
         "--resolution", "1", "--voxel_size", "0.03", "--sdf_trunc", "0.12",
         "--min_weight", "1.0"],
    )
    assert os.path.exists(os.path.join(out, "fused_mesh.ply"))
    from gaustudio_tpu.utils.mesh import load_mesh

    verts, faces = load_mesh(os.path.join(out, "fused_mesh.ply"))
    assert len(verts) > 50 and len(faces) > 50


def test_gs_from_mesh_cli(tmp_path):
    from gaustudio_tpu.scripts import mesh2gs

    # icosahedron-ish mesh from marching a sphere
    from gaustudio_tpu.ops import mcubes

    lin = np.linspace(-1, 1, 24, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - 0.5
    verts, faces = mcubes.marching_tetrahedra(sdf, 0.0, origin=np.full(3, -1.0),
                                              voxel_size=lin[1] - lin[0])
    mesh_path = str(tmp_path / "in.ply")
    save_mesh(mesh_path, verts, faces,
              vertex_colors=np.full((len(verts), 3), 0.6, np.float32))
    out_path = str(tmp_path / "gs.ply")
    _run_main(mesh2gs, ["-m", mesh_path, "-o", out_path, "-n", "1"])

    pcd = models.make({"name": "vanilla_pcd", "sh_degree": 1})
    pcd.load(out_path)
    assert pcd.num_points == len(faces)


def test_gs_train_cli_smoke(tmp_path):
    """Tiny nerf-synthetic-style training run through the CLI."""
    import json as _json
    from PIL import Image

    from gaustudio_tpu.scripts import train as train_script

    rng = np.random.default_rng(1)
    src = tmp_path / "scene"
    (src / "train").mkdir(parents=True)
    frames = []
    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=4,
                                            image_size=32, fov_deg=50)
    for i, cam in enumerate(cams):
        img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(src / "train" / f"r_{i}.png")
        c2w = np.linalg.inv(cam.extrinsics)
        c2w[:, 1:3] *= -1  # invert the loader's flip
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    (src / "transforms_train.json").write_text(
        _json.dumps({"camera_angle_x": float(cams[0].FoVx), "w": 32, "h": 32,
                     "frames": frames})
    )
    out = str(tmp_path / "out")
    _run_main(
        train_script,
        ["-s", str(src), "-o", out, "--dataset", "nerf", "--iterations", "20",
         "--save_every", "20", "--init_points", "500"],
    )
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_20",
                                       "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "cameras.json"))


def _write_nerf_scene(path, num_cam=3, size=32, seed=3):
    import json as _json

    from PIL import Image

    rng = np.random.default_rng(seed)
    (path / "train").mkdir(parents=True)
    frames = []
    cams = camera_paths.get_path_from_orbit(np.zeros(3), 2.0, num_cam=num_cam,
                                            image_size=size, fov_deg=50)
    for i, cam in enumerate(cams):
        img = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(path / "train" / f"r_{i}.png")
        c2w = np.linalg.inv(cam.extrinsics)
        c2w[:, 1:3] *= -1
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    (path / "transforms_train.json").write_text(
        _json.dumps({"camera_angle_x": float(cams[0].FoVx), "w": size,
                     "h": size, "frames": frames})
    )
    return cams


@pytest.mark.slow
def test_gs_train_cli_resume(tmp_path):
    """--checkpoint_every writes full orbax state; --resume continues from
    it (step counter and point count restored)."""
    from gaustudio_tpu.scripts import train as train_script

    src = tmp_path / "scene"
    _write_nerf_scene(src)
    out = str(tmp_path / "out")
    common = ["-s", str(src), "-o", out, "--dataset", "nerf",
              "--save_every", "10", "--init_points", "300"]
    _run_main(train_script, common + ["--iterations", "10",
                                      "--checkpoint_every", "10"])
    ckpt = os.path.join(out, "ckpt", "step_10")
    assert os.path.isdir(ckpt)

    from gaustudio_tpu.pipelines import train as T
    state = T.load_checkpoint(ckpt)
    assert int(state.step) == 10

    # --iterations is the ABSOLUTE target: resuming from step 10 with a
    # target of 20 runs exactly 10 more steps; checkpoints use absolute
    # step names so nothing gets overwritten with mislabeled state
    _run_main(train_script, common + ["--iterations", "20",
                                      "--resume", ckpt,
                                      "--checkpoint_every", "10"])
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_20",
                                       "point_cloud.ply"))
    state2 = T.load_checkpoint(os.path.join(out, "ckpt", "step_20"))
    assert int(state2.step) == 20


@pytest.mark.slow
def test_gs_train_cli_2dgs_smoke(tmp_path):
    """--config 2dgs routes to the SurfelTrainer; the exported ply must be
    a 2DGS checkpoint (scale_0/scale_1 only) that the renderers accept."""
    from gaustudio_tpu.scripts import train as train_script
    from gaustudio_tpu.utils.ply import read_ply

    src = tmp_path / "scene"
    cams = _write_nerf_scene(src, num_cam=3, seed=2)
    out = str(tmp_path / "out2d")
    _run_main(
        train_script,
        ["-s", str(src), "-o", out, "--dataset", "nerf", "--config", "2dgs",
         "--iterations", "10", "--save_every", "10", "--init_points", "300"],
    )
    ply_path = os.path.join(out, "point_cloud", "iteration_10",
                            "point_cloud.ply")
    assert os.path.exists(ply_path)
    names = list(read_ply(ply_path)["vertex"].keys())
    assert "scale_0" in names and "scale_1" in names
    assert "scale_2" not in names, "2DGS export must have 2-dim scales"

    # the exported checkpoint renders through the registry surface
    from gaustudio_tpu import models, renderers
    pcd = models.make({"name": "vanilla_pcd",
                       "attributes": {"xyz": 3, "opacity": 1, "f_dc": 3,
                                      "f_rest": 45, "scale": 2, "rot": 4}})
    pcd.load(ply_path)
    r = renderers.make({"name": "surfel_renderer"})
    cam = cams[0]
    outp = r.render(cam, pcd)
    assert np.isfinite(np.asarray(outp["render"])).all()


@pytest.mark.slow
def test_gs_render_mesh_and_texture_cli(trained_model_dir, tmp_path):
    from gaustudio_tpu.ops import mcubes
    from gaustudio_tpu.scripts import render_mesh, texture_mesh
    from gaustudio_tpu.utils.mesh import load_mesh, save_mesh

    lin = np.linspace(-1, 1, 24, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - 0.45
    verts, faces = mcubes.marching_tetrahedra(sdf, 0.0, origin=np.full(3, -1.0),
                                              voxel_size=lin[1] - lin[0])
    mesh_path = str(tmp_path / "sphere.ply")
    save_mesh(mesh_path, verts, faces,
              vertex_colors=np.abs(verts) / np.abs(verts).max())

    out = str(tmp_path / "mrender")
    _run_main(render_mesh, [
        "-m", mesh_path, "-c", os.path.join(trained_model_dir, "cameras.json"),
        "-o", out, "--color",
    ])
    assert len(os.listdir(os.path.join(out, "depth"))) == 6
    assert len(os.listdir(os.path.join(out, "normal"))) == 6
    assert len([f for f in os.listdir(os.path.join(out, "color"))
                if f.endswith(".png")]) == 6

    # texture baking: images from gs-render output of the model dir
    from gaustudio_tpu.scripts import render as render_script

    rdir = str(tmp_path / "gsrender")
    _run_main(render_script, ["-m", trained_model_dir, "-o", rdir, "--sh", "0"])
    import shutil
    shutil.copytree(os.path.join(rdir, "images"),
                    os.path.join(tmp_path, "texsrc", "images"))
    shutil.copy(os.path.join(trained_model_dir, "cameras.json"),
                os.path.join(tmp_path, "texsrc", "cameras.json"))
    out_mesh = str(tmp_path / "textured.ply")
    _run_main(texture_mesh, [
        "-m", mesh_path, "-c", os.path.join(tmp_path, "texsrc", "cameras.json"),
        "-o", out_mesh,
    ])
    tv, tf = load_mesh(out_mesh)
    assert len(tv) == len(verts)
