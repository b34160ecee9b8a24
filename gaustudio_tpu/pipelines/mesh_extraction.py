"""gs-extract-mesh pipeline: multi-view depth render -> TSDF -> mesh.

Port of the hot loop of gaustudio/scripts/extract_mesh.py:86-186 on the JAX
stack: median-depth renders masked at final-opacity 0.5, projective TSDF
fusion (replacing vdbfusion), marching-tetrahedra extraction (replacing VDB
marching cubes), optional connected-component cleanup, and the
mvs-texturing output layout (images/, masks/, per-view .cam files).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.ops import mcubes, tsdf
from gaustudio_tpu.utils import mesh as meshu


def save_image(path: str, array: np.ndarray) -> None:
    """[H,W,3] or [H,W] float image in [0,1] -> png."""
    from PIL import Image

    arr = np.asarray(array)
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def write_cam_file(path: str, camera: Camera) -> None:
    """mvs-texturing .cam file (extract_mesh.py:120-143)."""
    K = np.asarray(camera.intrinsics)
    fx, fy = K[0, 0], K[1, 1]
    paspect = fy / fx
    width, height = camera.image_width, camera.image_height
    dim_aspect = width / height
    img_aspect = dim_aspect * paspect
    flen = fy / height if img_aspect < 1.0 else fx / width
    ppx = K[0, 2] / width
    ppy = K[1, 2] / height
    P = np.asarray(camera.extrinsics)
    s1 = " ".join(str(P[i][j]) for i in range(3) for j in range(3))
    s2 = " ".join(str(P[i][3]) for i in range(3))
    with open(path, "w") as f:
        f.write(f"{s2} {s1}\n")
        f.write(f"{flen} 0 0 {paspect} {ppx} {ppy}\n")


def iter_fused_depths(renderer, pcd, cameras: List[Camera], work_dir=None):
    """Yield per-view (camera, device depth map) with median depth masked by
    final opacity < 0.5 (extract_mesh.py:99-117), optionally saving
    renders/masks/.cam files.

    Depth maps stay ON DEVICE (the TSDF integrate consumes them there);
    image buffers are only downloaded when ``work_dir`` asks for files —
    device->host transfers ride the relay on remote-attached TPUs and
    dominate the loop otherwise. Yielding (instead of returning a list)
    keeps a single depth map live at a time."""
    if work_dir is not None:
        os.makedirs(os.path.join(work_dir, "images"), exist_ok=True)
        os.makedirs(os.path.join(work_dir, "masks"), exist_ok=True)
    for i, camera in enumerate(cameras):
        out = renderer.render(camera, pcd)
        opacity = out["rendered_final_opacity"][0]
        depth = out["rendered_median_depth"][0]
        invalid = opacity < 0.5
        depth = jnp.where(invalid, 0.0, depth)
        if work_dir is not None:
            inv_np = np.asarray(invalid)
            rgb = np.moveaxis(np.asarray(out["render"]), 0, -1)
            rgb = np.where(inv_np[..., None], 0.0, rgb)
            name = camera.image_name or f"view_{i:04d}"
            save_image(os.path.join(work_dir, "images", f"{name}.png"), rgb)
            save_image(os.path.join(work_dir, "masks", f"{name}.png"),
                       (~inv_np).astype(np.float32))
            write_cam_file(os.path.join(work_dir, "images", f"{name}.cam"), camera)
        yield camera, depth


def render_fused_depths(renderer, pcd, cameras: List[Camera], work_dir=None):
    """List-returning wrapper of iter_fused_depths (kept for callers that
    want all views at once; large captures should iterate)."""
    return list(iter_fused_depths(renderer, pcd, cameras, work_dir))


def extract_mesh(
    pcd,
    renderer,
    cameras: List[Camera],
    work_dir: Optional[str] = None,
    voxel_size: float = 0.01,
    sdf_trunc: float = 0.04,
    min_weight: float = 5.0,
    stride: int = 3,
    downsample: int = 2,
    clean: bool = False,
    max_dim: int = 384,
):
    """Full gs-extract-mesh (scripts/extract_mesh.py:86-186).

    Returns (vertices, faces); writes fused_mesh.ply + per-view outputs when
    ``work_dir`` is given.
    """
    cams = [c.downsample_scale(downsample) for c in cameras[::stride]]

    # the fusion loop reads median depth + final opacity, never median-ID:
    # drop the gid sort operand from every per-view render (the reference
    # allmap id channel is an optional extension, surfel_renderer.py:112)
    if hasattr(renderer, "config"):
        renderer.config.setdefault("median_id", False)

    # volume bounds from the gaussian centers (the reference's VDB is
    # unbounded; we size a dense grid from the scene's robust bbox)
    lo, hi = tsdf.integrate_points_bounds(np.asarray(pcd.get_attribute("xyz")))
    vol = tsdf.volume_from_bounds(lo, hi, voxel_size, sdf_trunc, max_dim=max_dim)

    # render + integrate per view so only ONE depth map is device-resident
    # at a time (500 views at 1080p would otherwise hold ~4 GB of HBM)
    for camera, depth in iter_fused_depths(renderer, pcd, cams, work_dir):
        vol = tsdf.integrate(
            vol,
            depth,
            jnp.asarray(camera.intrinsics),
            jnp.asarray(camera.extrinsics),
        )

    verts, faces = mcubes.marching_tetrahedra(
        np.asarray(vol.tsdf),
        iso=0.0,
        weight=np.asarray(vol.weight),
        min_weight=min_weight,
        origin=np.asarray(vol.origin),
        voxel_size=float(vol.voxel_size),
        slab=4,
    )
    if clean:
        verts, faces = meshu.clean_mesh_components(verts, faces, ratio_threshold=0.5)
    if work_dir is not None:
        meshu.save_mesh(os.path.join(work_dir, "fused_mesh.ply"), verts, faces)
    return verts, faces
