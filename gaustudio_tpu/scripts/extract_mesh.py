"""gs-extract-mesh: render depth from training views -> TSDF -> mesh.

CLI port of gaustudio/scripts/extract_mesh.py:21-186 (same flags/UX).
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="vanilla", help="config name or path")
    parser.add_argument("--gpu", default="0", help="accepted for CLI parity (unused on TPU)")
    parser.add_argument("--model", "-m", default=None, help="path to the model")
    parser.add_argument("--source_path", "-s", help="path to the dataset")
    parser.add_argument("--output-dir", "-o", default=None, help="output dir")
    parser.add_argument("--load_iteration", default=-1, type=int)
    parser.add_argument("--resolution", default=2, type=int, help="downscale")
    parser.add_argument("--sh", default=0, type=int, help="default SH degree")
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--clean", action="store_true")
    parser.add_argument("--voxel_size", default=0.01, type=float)
    parser.add_argument("--sdf_trunc", default=0.04, type=float)
    parser.add_argument("--min_weight", default=5.0, type=float)
    parser.add_argument("--stride", default=3, type=int)
    args, extras = parser.parse_known_args()

    from gaustudio_tpu import datasets, models, renderers
    from gaustudio_tpu.config import builtin_config_path, load_config
    from gaustudio_tpu.datasets.utils import JSON_to_camera
    from gaustudio_tpu.pipelines.mesh_extraction import extract_mesh
    from gaustudio_tpu.utils.misc import searchForMaxIteration

    config_path = args.config if os.path.exists(args.config) else builtin_config_path(args.config)
    config = load_config(config_path, cli_args=extras)

    pcd = models.make(config["model"]["pointcloud"])
    renderer = renderers.make(config["renderer"])
    pcd.active_sh_degree = args.sh

    model_path = args.model
    if os.path.isdir(model_path):
        loaded_iter = (
            searchForMaxIteration(os.path.join(model_path, "point_cloud"))
            if args.load_iteration == -1
            else args.load_iteration
        )
        work_dir = (
            os.path.join(model_path, "renders", f"iteration_{loaded_iter}")
            if args.output_dir is None
            else args.output_dir
        )
        print(f"Loading trained model at iteration {loaded_iter}")
        pcd.load(
            os.path.join(model_path, "point_cloud", f"iteration_{loaded_iter}",
                         "point_cloud.ply")
        )
    elif model_path.endswith(".ply"):
        work_dir = (
            os.path.join(os.path.dirname(model_path), os.path.basename(model_path)[:-4])
            if args.output_dir is None
            else args.output_dir
        )
        pcd.load(model_path)
    else:
        raise SystemExit(f"Model not found at {model_path}")

    if args.source_path is None:
        args.source_path = os.path.join(
            model_path if os.path.isdir(model_path) else os.path.dirname(model_path),
            "cameras.json",
        )

    if args.source_path.endswith(".json"):
        print(f"Loading camera data from {args.source_path}")
        with open(args.source_path) as f:
            camera_data = json.load(f)
        cameras = [JSON_to_camera(cj) for cj in camera_data]
    else:
        dataset = datasets.make(
            {"name": "colmap", "source_path": args.source_path, "images": "images"}
        )
        cameras = dataset.all_cameras

    os.makedirs(work_dir, exist_ok=True)
    verts, faces = extract_mesh(
        pcd, renderer, cameras,
        work_dir=work_dir,
        voxel_size=args.voxel_size,
        sdf_trunc=args.sdf_trunc,
        min_weight=args.min_weight,
        stride=args.stride,
        downsample=args.resolution,
        clean=args.clean,
    )
    print(f"Extracted mesh: {len(verts)} vertices, {len(faces)} faces -> "
          f"{os.path.join(work_dir, 'fused_mesh.ply')}")


if __name__ == "__main__":
    main()
