"""gs-texture-mesh: bake per-vertex colors onto a mesh from posed images.

CLI port of gaustudio/scripts/texture_mesh.py (Unique3D-style projection;
pytorch3d replaced by the JAX mesh rasterizer): each vertex gathers colors
from the views where it is visible (z-buffer test), weighted by viewing
angle, and the colored mesh is exported as ply.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpu", default="0", help="CLI parity (unused on TPU)")
    parser.add_argument("--camera", "-c", default=None)
    parser.add_argument("--mesh", "-m", required=True)
    parser.add_argument("--source-path", "-s", default=None)
    parser.add_argument("--output-path", "-o", required=True)
    args, _ = parser.parse_known_args()

    import jax.numpy as jnp

    from gaustudio_tpu import datasets
    from gaustudio_tpu.datasets.utils import JSON_to_camera
    from gaustudio_tpu.ops import mesh_raster
    from gaustudio_tpu.utils.mesh import load_mesh, save_mesh

    verts, faces = load_mesh(args.mesh)

    if args.camera and os.path.exists(args.camera):
        cameras = [JSON_to_camera(cj) for cj in json.load(open(args.camera))]
        image_dir = os.path.join(os.path.dirname(args.camera), "images")
        for cam in cameras:
            p = os.path.join(image_dir, f"{cam.image_name}.png")
            if os.path.exists(p):
                cam.load_image(p)
    else:
        dataset = datasets.make({"name": "colmap", "source_path": args.source_path})
        cameras = dataset.all_cameras

    vnormals = np.zeros_like(verts)
    fn = np.asarray(mesh_raster.face_normals(jnp.asarray(verts), jnp.asarray(faces)))
    for i in range(3):
        np.add.at(vnormals, faces[:, i], fn)
    vnormals /= np.maximum(np.linalg.norm(vnormals, axis=1, keepdims=True), 1e-12)

    acc = np.zeros((len(verts), 3), np.float64)
    wsum = np.zeros(len(verts), np.float64)
    for cam in cameras:
        if cam.image is None:
            continue
        H, W = int(cam.image_height), int(cam.image_width)
        frag = mesh_raster.rasterize_mesh(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform), W, H,
        )
        depth = np.asarray(frag.depth)
        # project vertices
        hom = verts @ np.asarray(cam.full_proj_transform)[:3, :] + np.asarray(
            cam.full_proj_transform)[3, :]
        ndc = hom[:, :3] / (hom[:, 3:4] + 1e-9)
        px = ((ndc[:, 0] + 1) * W - 1) / 2
        py = ((ndc[:, 1] + 1) * H - 1) / 2
        zv = (verts @ np.asarray(cam.world_view_transform)[:3, :]
              + np.asarray(cam.world_view_transform)[3, :])[:, 2]
        xi = np.clip(np.round(px).astype(int), 0, W - 1)
        yi = np.clip(np.round(py).astype(int), 0, H - 1)
        in_img = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (zv > 1e-3)
        visible = in_img & (zv <= depth[yi, xi] * 1.01 + 1e-3)

        cam_pos = np.asarray(cam.camera_center)
        view_dir = cam_pos[None, :] - verts
        view_dir /= np.maximum(np.linalg.norm(view_dir, axis=1, keepdims=True), 1e-12)
        w = np.abs((view_dir * vnormals).sum(1))
        w = np.where(visible, w, 0.0)

        img = np.asarray(cam.image)
        acc += w[:, None] * img[yi, xi]
        wsum += w

    colors = np.where(wsum[:, None] > 1e-6, acc / np.maximum(wsum[:, None], 1e-6), 0.5)
    save_mesh(args.output_path, verts, faces, vertex_colors=colors.astype(np.float32))
    print(f"Textured mesh saved to {args.output_path} "
          f"({(wsum > 0).mean() * 100:.1f}% vertices covered)")


if __name__ == "__main__":
    main()
