"""gs-render-mesh: render color/depth/normal maps of a mesh from cameras.

CLI port of gaustudio/scripts/render_mesh.py (pytorch3d replaced by the
JAX tile mesh rasterizer, ops/mesh_raster.py).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpu", default="0", help="CLI parity (unused on TPU)")
    parser.add_argument("--camera", "-c", default=None, help="path to cameras.json")
    parser.add_argument("--mesh", "-m", required=True)
    parser.add_argument("--source_path", "-s", default=None)
    parser.add_argument("--output-dir", "-o", required=True)
    parser.add_argument("--color", action="store_true", help="render vertex colors")
    args, _ = parser.parse_known_args()

    import jax.numpy as jnp

    from gaustudio_tpu import datasets
    from gaustudio_tpu.datasets.utils import JSON_to_camera
    from gaustudio_tpu.ops import mesh_raster
    from gaustudio_tpu.pipelines.mesh_extraction import save_image, write_cam_file
    from gaustudio_tpu.utils.depth import apply_depth_colormap
    from gaustudio_tpu.utils.ply import read_ply

    data = read_ply(args.mesh)
    v = data["vertex"]
    verts = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    faces = np.asarray(data["face"]["vertex_indices"], np.int32)
    vcolors = None
    if "red" in v:
        vcolors = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float32)
        if vcolors.max() > 1:
            vcolors /= 255.0

    if args.camera and os.path.exists(args.camera):
        cameras = [JSON_to_camera(cj) for cj in json.load(open(args.camera))]
    else:
        dataset = datasets.make({"name": "colmap", "source_path": args.source_path})
        cameras = dataset.all_cameras

    for sub in ("color", "depth", "normal"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)

    fnormals = np.asarray(mesh_raster.face_normals(jnp.asarray(verts),
                                                   jnp.asarray(faces)))
    for i, cam in enumerate(cameras):
        frag = mesh_raster.rasterize_mesh(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform),
            int(cam.image_width), int(cam.image_height),
        )
        name = cam.image_name or f"view_{i:04d}"
        mask = np.asarray(frag.mask)
        depth = np.asarray(frag.depth)
        tri = np.asarray(frag.tri_id)

        # normal map: face normals flipped toward the camera (render_mesh.py:149-176)
        n = fnormals[np.maximum(tri, 0)]
        cam_pos = np.asarray(cam.camera_center)
        # flip so normals face the camera
        view_dir = cam_pos[None, None, :]  # direction heuristic
        flip = (n[..., 2:3] > 0)
        n = np.where(flip, -n, n)
        n_img = np.where(mask[..., None], (n + 1) / 2, 0)
        save_image(os.path.join(args.output_dir, "normal", f"{name}.png"), n_img)

        d_img = apply_depth_colormap(np.where(mask, depth, depth[mask].max()
                                              if mask.any() else 1.0))
        save_image(os.path.join(args.output_dir, "depth", f"{name}.png"), d_img)

        if args.color and vcolors is not None:
            c = np.asarray(
                mesh_raster.interpolate_attribute(frag, jnp.asarray(faces),
                                                  jnp.asarray(vcolors))
            )
            save_image(os.path.join(args.output_dir, "color", f"{name}.png"), c)
        write_cam_file(os.path.join(args.output_dir, "color", f"{name}.cam"), cam)
    print(f"Rendered {len(cameras)} mesh views to {args.output_dir}")


if __name__ == "__main__":
    main()
