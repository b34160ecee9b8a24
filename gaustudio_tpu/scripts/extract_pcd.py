"""gs-extract-pcd: surface point extraction + normal fusion + meshing.

CLI port of gaustudio/scripts/extract_pcd.py:240-408.
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
    parser.add_argument("--camera", "-c", default=None, help="path to cameras.json")
    parser.add_argument("--model", "-m", default=None)
    parser.add_argument("--output-dir", "-o", default=None)
    parser.add_argument("--load_iteration", default=-1, type=int)
    parser.add_argument("--resolution", default=1, type=int)
    parser.add_argument("--sh", default=0, type=int)
    parser.add_argument(
        "--meshing",
        choices=["sap", "nksr", "poisson", "pymeshlab", "None", None],
        default="sap",
        help="sap: native DPSR; nksr/poisson/pymeshlab: external backends "
             "(reference extract_pcd.py:53-106)",
    )
    args, extras = parser.parse_known_args()

    from gaustudio_tpu import models, renderers
    from gaustudio_tpu.config import builtin_config_path, load_config
    from gaustudio_tpu.datasets.utils import JSON_to_camera
    from gaustudio_tpu.pipelines import pcd_extraction as P
    from gaustudio_tpu.utils.mesh import save_mesh
    from gaustudio_tpu.utils.ply import store_ply
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
            if args.output_dir is None else args.output_dir
        )
        pcd.load(os.path.join(model_path, "point_cloud",
                              f"iteration_{loaded_iter}", "point_cloud.ply"))
        output_pcd_path = os.path.join(work_dir, "fused.ply")
    else:
        work_dir = args.output_dir or os.path.join(
            os.path.dirname(model_path), os.path.basename(model_path)[:-4])
        pcd.load(model_path)
        output_pcd_path = model_path[:-4] + "_fused.ply"

    if args.camera is None:
        args.camera = os.path.join(
            model_path if os.path.isdir(model_path) else os.path.dirname(model_path),
            "cameras.json",
        )
    with open(args.camera) as f:
        cameras = [JSON_to_camera(cj) for cj in json.load(f)]

    os.makedirs(work_dir, exist_ok=True)
    xyz, colors, normals = P.extract_surface_points(
        pcd, renderer, cameras, work_dir=work_dir, downsample=args.resolution
    )
    print(f"Point cloud cleaned. Remaining points: {len(xyz)}")
    store_ply(output_pcd_path, xyz, (colors * 255).astype(np.uint8), normals)

    if args.meshing not in ("None", None):
        if args.meshing == "sap":
            verts, faces = P.mesh_sap(xyz, normals)
        elif args.meshing == "nksr":
            verts, faces = P.mesh_nksr(xyz, normals)
        elif args.meshing == "poisson":
            verts, faces = P.mesh_poisson(xyz, colors, normals)
        elif args.meshing == "pymeshlab":
            verts, faces = P.mesh_pymeshlab_poisson(output_pcd_path)
        save_mesh(os.path.join(work_dir, "fused_mesh.ply"), verts, faces)
        print(f"Mesh saved to {os.path.join(work_dir, 'fused_mesh.ply')}")


if __name__ == "__main__":
    main()
