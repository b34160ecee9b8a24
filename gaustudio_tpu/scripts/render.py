"""gs-render: render a trained model from dataset cameras or a flythrough.

CLI port of gaustudio/scripts/render_gs.py:20-141.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="vanilla")
    parser.add_argument("--gpu", default="0", help="CLI parity (unused on TPU)")
    parser.add_argument("--model", "-m", default=None, help="path to the model")
    parser.add_argument("--source_path", "-s", default=None)
    parser.add_argument("--output-dir", "-o", default=None)
    parser.add_argument("--load_iteration", default=-1, type=int)
    parser.add_argument("--resolution", default=1, type=int)
    parser.add_argument("--sh", default=0, type=int)
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--flythrough", action="store_true",
                        help="smooth/resample the camera path before rendering")
    parser.add_argument("--fps", default=30, type=int)
    args, extras = parser.parse_known_args()

    from gaustudio_tpu import datasets, models, renderers
    from gaustudio_tpu.config import builtin_config_path, load_config
    from gaustudio_tpu.datasets.utils import JSON_to_camera
    from gaustudio_tpu.pipelines.mesh_extraction import save_image
    from gaustudio_tpu.utils.misc import searchForMaxIteration

    config_path = args.config if os.path.exists(args.config) else builtin_config_path(args.config)
    config = load_config(config_path, cli_args=extras)
    if args.white_background:
        config["renderer"]["white_background"] = True

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
        pcd.load(os.path.join(model_path, "point_cloud",
                              f"iteration_{loaded_iter}", "point_cloud.ply"))
    else:
        work_dir = args.output_dir or os.path.join(
            os.path.dirname(model_path), os.path.basename(model_path)[:-4]
        )
        pcd.load(model_path)

    if args.source_path is None:
        args.source_path = os.path.join(
            model_path if os.path.isdir(model_path) else os.path.dirname(model_path),
            "cameras.json",
        )
    if args.source_path.endswith(".json"):
        with open(args.source_path) as f:
            cameras = [JSON_to_camera(cj) for cj in json.load(f)]
    else:
        dataset = datasets.make({"name": "colmap", "source_path": args.source_path})
        cameras = dataset.all_cameras

    if args.flythrough:
        from gaustudio_tpu.cameras.camera_paths import (
            downsample_cameras, smoothen_cameras, upsample_cameras_velocity,
            validate_paths,
        )

        cameras = validate_paths(cameras)
        cameras = downsample_cameras(cameras)
        cameras = smoothen_cameras(cameras)
        cameras = upsample_cameras_velocity(cameras)

    render_path = os.path.join(work_dir, "images")
    os.makedirs(render_path, exist_ok=True)
    frames = []
    for i, camera in enumerate(cameras):
        if args.resolution > 1:
            camera = camera.downsample_scale(args.resolution)
        out = renderer.render(camera, pcd)
        rgb = np.moveaxis(np.asarray(out["render"]), 0, -1)
        opacity = np.asarray(out["rendered_final_opacity"][0])
        rgb = np.where((opacity >= 0.5)[..., None], rgb, 0.0)
        name = camera.image_name or f"frame_{i:05d}"
        if name.lower().endswith((".png", ".jpg", ".jpeg")):
            name = os.path.splitext(name)[0]
        save_image(os.path.join(render_path, f"{name}.png"), rgb)
        frames.append(np.clip(rgb * 255, 0, 255).astype(np.uint8))

    try:
        import imageio.v2 as imageio

        imageio.mimwrite(os.path.join(work_dir, "render.mp4"), frames, fps=args.fps)
    except Exception as e:  # ffmpeg backend may be unavailable
        print(f"Skipping video export: {e}")
    print(f"Rendered {len(frames)} views to {render_path}")


if __name__ == "__main__":
    main()
