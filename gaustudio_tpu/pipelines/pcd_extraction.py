"""gs-extract-pcd pipeline: surface point extraction + normal fusion + meshing.

Port of gaustudio/scripts/extract_pcd.py:23-238: per-view masked bilateral
depth filtering, depth->normal, median-Gaussian-id voting, multi-view
normal fusion with view/distance weights + consistency re-vote + kNN
smoothing, statistical/normal outlier cleanup, and DPSR ('sap') meshing.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.datasets.utils import getNerfppNorm
from gaustudio_tpu.ops.sh import SH2RGB
from gaustudio_tpu.pipelines.mesh_extraction import save_image, write_cam_file


def masked_bilateral_filter(depth: np.ndarray, mask: np.ndarray, d: int = 3,
                            sigma_color: float = 75, sigma_space: float = 75):
    """extract_pcd.py:185-238: bilateral filter on valid pixels; the mask is
    eroded so windows touching invalid pixels are dropped."""
    import cv2

    depth_np = np.asarray(depth, np.float32)
    mask_np = np.asarray(mask).astype(np.float32)

    kernel = np.ones((d, d), np.uint8)
    invalid = (1 - mask_np).astype(np.uint8)
    dilated_invalid = cv2.dilate(invalid, kernel)
    new_mask = (1 - dilated_invalid).astype(bool)

    filtered = depth_np.copy()
    valid = new_mask & np.isfinite(depth_np)
    if valid.any():
        vmin = depth_np[valid].min()
        vmax = depth_np[valid].max()
        normalized = (depth_np - vmin) / max(vmax - vmin, 1e-9)
        normalized[~valid] = 0.0
        filtered_norm = cv2.bilateralFilter(
            normalized.astype(np.float32), d=d, sigmaColor=sigma_color,
            sigmaSpace=sigma_space,
        )
        out = filtered_norm * (vmax - vmin) + vmin
        filtered = np.where(valid, out, depth_np)
    return filtered, new_mask


def _view_weights(xyz: np.ndarray, normals: np.ndarray, confidences: np.ndarray,
                  cam_t: np.ndarray):
    """Per-sample fusion weight (extract_pcd.py:118-127)."""
    view_dir = cam_t[None, :] - xyz
    dist = np.linalg.norm(view_dir, axis=1)
    view_dir = view_dir / np.maximum(dist[:, None], 1e-9)
    view_w = np.abs(np.sum(view_dir * normals, axis=1))
    return confidences * view_w / (dist + 1e-6)


def normal_fusion(pcd, all_ids: List[np.ndarray], all_normals: List[np.ndarray],
                  all_confidences: List[np.ndarray], cameras: List[Camera],
                  consistency_threshold: float = 0.8, knn: int = 10):
    """extract_pcd.py:108-183: weighted normal voting per unique Gaussian id,
    consistency re-vote, kNN spatial smoothing."""
    xyz_all = np.asarray(pcd._xyz)
    cat_ids = np.concatenate(all_ids)
    unique_ids, inverse = np.unique(cat_ids, return_inverse=True)
    n_unique = len(unique_ids)

    def accumulate(mean_normals=None):
        sum_n = np.zeros((n_unique, 3), np.float64)
        sum_w = np.zeros(n_unique, np.float64)
        start = 0
        for ids, normals, conf, cam in zip(all_ids, all_normals,
                                           all_confidences, cameras):
            end = start + len(ids)
            inv = inverse[start:end]
            cam_t = np.asarray(cam.extrinsics)[:3, 3]
            w = _view_weights(xyz_all[ids], normals, conf, cam_t)
            if mean_normals is not None:
                diff = np.linalg.norm(normals - mean_normals[inv], axis=1)
                keep = diff < consistency_threshold
                inv, normals, w = inv[keep], normals[keep], w[keep]
            np.add.at(sum_n, inv, normals * w[:, None])
            np.add.at(sum_w, inv, w)
            start = end
        mean = sum_n / np.maximum(sum_w[:, None], 1e-12)
        return mean / np.maximum(np.linalg.norm(mean, axis=1, keepdims=True), 1e-12)

    mean_normals = accumulate()
    mean_normals = accumulate(mean_normals)

    # kNN spatial smoothing (extract_pcd.py:169-181)
    from scipy.spatial import cKDTree

    surf_xyz = xyz_all[unique_ids]
    dists, nbrs = cKDTree(surf_xyz).query(surf_xyz, k=min(knn, len(surf_xyz)))
    w = np.exp(-dists / 0.1)
    smoothed = np.einsum("nk,nkc->nc", w, mean_normals[nbrs])
    smoothed /= np.maximum(np.linalg.norm(smoothed, axis=1, keepdims=True), 1e-12)
    return unique_ids, smoothed.astype(np.float32)


def clean_point_cloud(xyz, colors, normals, nb_neighbors: int = 50,
                      std_ratio: float = 2.0, angle_threshold: float = np.pi / 4,
                      normal_nb: int = 20):
    """extract_pcd.py:30-51 without open3d: statistical distance outliers +
    mean-neighbor-normal-angle outliers."""
    from scipy.spatial import cKDTree

    xyz = np.asarray(xyz)
    k = min(nb_neighbors + 1, len(xyz))
    tree = cKDTree(xyz)
    dists, _ = tree.query(xyz, k=k)
    mean_d = dists[:, 1:].mean(axis=1)
    thr = mean_d.mean() + std_ratio * mean_d.std()
    keep = mean_d <= thr
    xyz, colors, normals = xyz[keep], colors[keep], normals[keep]

    if len(xyz):
        k2 = min(normal_nb + 1, len(xyz))
        _, nbrs = cKDTree(xyz).query(xyz, k=k2)
        nn = normals[nbrs[:, 1:]]
        cosang = np.clip(np.abs(np.einsum("nkc,nc->nk", nn, normals)), -1, 1)
        angles = np.arccos(cosang).mean(axis=1)
        keep2 = angles < angle_threshold
        xyz, colors, normals = xyz[keep2], colors[keep2], normals[keep2]
    return xyz, colors, normals


def extract_surface_points(
    pcd,
    renderer,
    cameras: List[Camera],
    work_dir: Optional[str] = None,
    downsample: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Main loop of extract_pcd.py:314-380: returns (xyz, rgb, normal)."""
    if work_dir is not None:
        for sub in ("images", "normals", "masks"):
            os.makedirs(os.path.join(work_dir, sub), exist_ok=True)

    cams = [c.downsample_scale(downsample) for c in cameras] if downsample > 1 else cameras
    scene_radius = getNerfppNorm(cams)["radius"]

    all_ids, all_normals, all_conf = [], [], []
    for i, camera in enumerate(cams):
        out = renderer.render(camera, pcd)
        opacity = np.asarray(out["rendered_final_opacity"][0])
        depth = np.asarray(out["rendered_depth"][0])
        fg = opacity > 0.1
        filtered, fg = masked_bilateral_filter(depth, fg)
        cam_normals = np.asarray(
            camera.depth2normal(jnp.asarray(filtered), coordinate="camera")
        )
        cam_normals[~fg] = -1
        normals = np.asarray(camera.normal2worldnormal(jnp.asarray(cam_normals)))

        med_depth = np.asarray(out["rendered_median_depth"][0])
        med_ids = np.asarray(out["rendered_median_id"][0])
        valid = (med_depth < scene_radius * 0.8) & (opacity > 0.5)
        valid &= normals.sum(-1) > -3

        all_ids.append(med_ids[valid])
        all_normals.append(-normals[valid])
        all_conf.append(opacity[valid])

        if work_dir is not None:
            name = camera.image_name or f"view_{i:04d}"
            rgb = np.moveaxis(np.asarray(out["render"]), 0, -1)
            save_image(os.path.join(work_dir, "images", f"{name}.png"), rgb)
            save_image(os.path.join(work_dir, "normals", f"{name}.png"),
                       (cam_normals + 1) / 2)
            save_image(os.path.join(work_dir, "masks", f"{name}.png"),
                       fg.astype(np.float32))
            write_cam_file(os.path.join(work_dir, "images", f"{name}.cam"), camera)

    unique_ids, fused_normals = normal_fusion(pcd, all_ids, all_normals,
                                              all_conf, cams)
    surface_xyz = np.asarray(pcd._xyz)[unique_ids]
    surface_color = np.clip(
        np.asarray(SH2RGB(np.asarray(pcd._f_dc).reshape(len(pcd._xyz), -1)[:, :3]))[
            unique_ids
        ],
        0,
        1,
    )
    return clean_point_cloud(surface_xyz, surface_color, fused_normals)


def mesh_sap(xyz, normals, grid_res: int = 128, sigma: float = 2.0):
    """DPSR meshing backend (extract_pcd.py:102-106)."""
    from gaustudio_tpu.models.sap import ShapeAsPoints

    sap = ShapeAsPoints.from_pointcloud(xyz, normals,
                                        {"grid_res": grid_res, "psr_sigma": sigma})
    return sap.generate_mesh()


def mesh_nksr(xyz, normals, voxel_size: float = 0.008, detail_level: int = 0):
    """NKSR meshing backend — delegates to the external ``nksr`` package
    (reference gaustudio/scripts/extract_pcd.py:53-66). Returns
    (verts [V,3], faces [F,3]) like mesh_sap."""
    try:
        import torch
        from nksr import Reconstructor
    except ImportError as e:
        raise ImportError("Please install nksr to use this feature.") from e
    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    pts = torch.as_tensor(np.asarray(xyz), dtype=torch.float32, device=device)
    nrm = torch.as_tensor(np.asarray(normals), dtype=torch.float32,
                          device=device)
    field = Reconstructor(device).reconstruct(
        pts, nrm, voxel_size=voxel_size, detail_level=detail_level
    )
    mesh = field.extract_dual_mesh(mise_iter=2)
    return mesh.v.cpu().numpy(), mesh.f.cpu().numpy()


def mesh_pymeshlab_poisson(pcd_path: str, depth: int = 8):
    """Screened-Poisson meshing via the external ``pymeshlab`` package
    (reference gaustudio/scripts/extract_pcd.py:79-101). Takes the fused
    ply path (pymeshlab loads from disk); returns (verts, faces)."""
    try:
        import pymeshlab
    except ImportError as e:
        raise ImportError("Please install pymeshlab to use this feature.") from e
    ms = pymeshlab.MeshSet()
    ms.load_new_mesh(pcd_path)
    ms.apply_filter("generate_surface_reconstruction_screened_poisson",
                    depth=depth)
    mesh = ms.current_mesh()
    return mesh.vertex_matrix(), mesh.face_matrix()


def mesh_poisson(xyz, colors, normals, depth: int = 8,
                 density_threshold: float = 0.01):
    """Poisson meshing via the external ``open3d`` package, with
    low-density vertex pruning (reference extract_pcd.py:68-77)."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError("Please install open3d to use this feature.") from e
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(xyz, np.float64))
    pcd.colors = o3d.utility.Vector3dVector(np.asarray(colors, np.float64))
    pcd.normals = o3d.utility.Vector3dVector(np.asarray(normals, np.float64))
    mesh, densities = o3d.geometry.TriangleMesh.create_from_point_cloud_poisson(
        pcd, depth=depth, width=0, scale=1.2, linear_fit=False
    )
    densities = np.asarray(densities)
    densities = (densities - densities.min()) / (
        densities.max() - densities.min() + 1e-12
    )
    mesh.remove_vertices_by_mask(densities < np.quantile(densities,
                                                         density_threshold))
    return np.asarray(mesh.vertices), np.asarray(mesh.triangles)
