"""TSDF fusion — jitted projective truncated-signed-distance integration.

TPU-native replacement for the reference's CPU ``vdbfusion.VDBVolume``
(scripts/extract_mesh.py:86,115,145: voxel_size=0.01, sdf_trunc=0.04,
min_weight=5).  Instead of ray-marching world points into a sparse VDB on
the host, a dense voxel grid is integrated *projectively* per view: every
voxel center is projected into the depth map, the view-ray SDF is clamped
to the truncation band, and (tsdf, weight) are updated as a running
weighted average.  Each view's update is a pure function of (grids, depth,
camera), so multi-view fusion batches over the camera-DP mesh axis with a
``psum``-style reduction (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume(NamedTuple):
    """Dense TSDF grid state (a pytree; dims are static via shape)."""

    tsdf: jnp.ndarray  # [X, Y, Z] in [-1, 1]
    weight: jnp.ndarray  # [X, Y, Z]
    origin: jnp.ndarray  # [3] world position of voxel (0,0,0) center
    voxel_size: jnp.ndarray  # [] float
    sdf_trunc: jnp.ndarray  # [] float


def create_volume(origin, dims: Tuple[int, int, int], voxel_size: float,
                  sdf_trunc: float) -> TSDFVolume:
    return TSDFVolume(
        tsdf=jnp.ones(dims, jnp.float32),
        weight=jnp.zeros(dims, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        sdf_trunc=jnp.asarray(sdf_trunc, jnp.float32),
    )


def volume_from_bounds(lo, hi, voxel_size: float, sdf_trunc: float,
                       max_dim: int = 512) -> TSDFVolume:
    """Host helper: grid covering [lo, hi] with at most max_dim³ voxels."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    extent = float(np.max(hi - lo))
    if extent / voxel_size + 1 > max_dim:
        # coarsen to keep the dense grid within budget (keep trunc/voxel ratio)
        scale = (extent / (max_dim - 1)) / voxel_size
        voxel_size = voxel_size * scale
        sdf_trunc = sdf_trunc * scale
    dims = np.ceil((hi - lo) / voxel_size).astype(int) + 1
    return create_volume(lo, tuple(int(d) for d in dims), voxel_size, sdf_trunc)


@jax.jit
def integrate(volume: TSDFVolume, depth, intrinsics, world_to_cam,
              max_weight: float = 64.0) -> TSDFVolume:
    """Fuse one depth map into the volume.

    Args:
        depth: [H, W] metric depth along the camera z axis; <= 0 marks
            invalid pixels (the reference zeroes masked median depth,
            extract_mesh.py:106-107).
        intrinsics: [3, 3] pinhole K (pixel units).
        world_to_cam: [4, 4] W2V in math convention (camera.extrinsics).
    """
    H, W = depth.shape
    dims = volume.tsdf.shape

    ii, jj, kk = jnp.meshgrid(
        jnp.arange(dims[0]), jnp.arange(dims[1]), jnp.arange(dims[2]),
        indexing="ij",
    )
    vox = jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32)
    world = volume.origin + vox * volume.voxel_size  # [X,Y,Z,3]

    R = world_to_cam[:3, :3]
    t = world_to_cam[:3, 3]
    cam = jnp.einsum("...j,ij->...i", world, R,
                 precision=jax.lax.Precision.HIGHEST) + t  # [X,Y,Z,3]
    z = cam[..., 2]

    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u = cam[..., 0] / z * fx + cx
    v = cam[..., 1] / z * fy + cy

    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_img = (z > 1e-4) & (u >= -0.5) & (u <= W - 0.5) & (v >= -0.5) & (v <= H - 0.5)

    d = depth[vi, ui]
    valid_depth = d > 0.0
    sdf = d - z
    inside_band = sdf > -volume.sdf_trunc
    tsdf_obs = jnp.minimum(1.0, sdf / volume.sdf_trunc)

    update = in_img & valid_depth & inside_band
    w_old = volume.weight
    w_obs = update.astype(jnp.float32)
    w_new = w_old + w_obs
    tsdf_new = jnp.where(
        update,
        (volume.tsdf * w_old + tsdf_obs * w_obs) / jnp.maximum(w_new, 1e-9),
        volume.tsdf,
    )
    return volume._replace(
        tsdf=tsdf_new, weight=jnp.minimum(w_new, max_weight)
    )


@jax.jit
def integrate_batch(volume: TSDFVolume, depths, intrinsics,
                    world_to_cam) -> TSDFVolume:
    """Fuse a stacked batch of views ([B, H, W] depths, [B, 3, 3], [B, 4, 4])
    sequentially via lax.scan — one dispatch for a whole camera-DP render
    batch instead of B relay round-trips."""

    def body(vol, x):
        d, K, E = x
        return integrate(vol, d, K, E), None

    vol, _ = jax.lax.scan(body, volume, (depths, intrinsics, world_to_cam))
    return vol


def integrate_points_bounds(points) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: robust (5/95 percentile, padded) bounds of a point set —
    the reference's get_center_and_size idea (models/base.py:32-40)."""
    pts = np.asarray(points)
    finite = np.isfinite(pts).all(axis=1)
    if not finite.all():
        # degenerate checkpoints (diverged training, corrupt ply) must not
        # poison the grid dims — vdbfusion would have skipped such points too
        if not finite.any():
            raise ValueError("integrate_points_bounds: no finite points")
        pts = pts[finite]
    lo = np.percentile(pts, 2, axis=0)
    hi = np.percentile(pts, 98, axis=0)
    pad = 0.05 * (hi - lo + 1e-6)
    return lo - pad, hi + pad
