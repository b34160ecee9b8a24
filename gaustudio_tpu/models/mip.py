"""MipPointCloud — Mip-Splatting model with the 3D smoothing filter.

Port of gaustudio/models/mip_sg.py:8-174: per-point 3D low-pass filter scale
computed from the minimum screen-space depth over training cameras
(compute_3D_filter, :93-142), and the filtered scaling/opacity getters
(:71-91).  The reference file has latent bugs (``self.get_attribute["scale"]``
subscripts a method at :73,83) — fixed here per SURVEY.md §2.2.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gaustudio_tpu import models
from gaustudio_tpu.models.vanilla import VanillaPointCloud


@models.register("mip_pcd")
class MipPointCloud(VanillaPointCloud):
    def __init__(self, config=None, device=None) -> None:
        super().__init__(config, device)
        self.filter_3D = None

    @property
    def get_scaling_with_3D_filter(self):
        """mip_sg.py:71-77: sqrt(s^2 + f^2)."""
        scales = self.get_attribute("scale")
        f = jnp.asarray(self.filter_3D)
        return jnp.sqrt(jnp.square(scales) + jnp.square(f))

    @property
    def get_opacity_with_3D_filter(self):
        """mip_sg.py:79-91: opacity * sqrt(det(s^2)/det(s^2 + f^2))."""
        opacity = self.get_attribute("opacity")
        scales = self.get_attribute("scale")
        s2 = jnp.square(scales)
        det1 = s2[:, 0] * s2[:, 1] * s2[:, 2]
        s2f = s2 + jnp.square(jnp.asarray(self.filter_3D))
        det2 = s2f[:, 0] * s2f[:, 1] * s2f[:, 2]
        coef = jnp.sqrt(det1 / det2)
        return opacity * coef[..., None]

    def compute_3D_filter(self, cameras):
        """mip_sg.py:93-142: per-point min screen depth / max focal."""
        xyz = np.asarray(self._xyz, np.float32)
        n = xyz.shape[0]
        distance = np.full(n, 100000.0, np.float32)
        valid_points = np.zeros(n, bool)
        focal_length = 0.0
        for camera in cameras:
            R = np.asarray(camera.R, np.float32)
            T = np.asarray(camera.T, np.float32)
            # R is stored "transposed" (reference comment): cam = xyz @ R + T
            xyz_cam = jnp.einsum("nj,ji->ni", xyz, R,
                     precision=jax.lax.Precision.HIGHEST) + T[None, :]
            valid_depth = xyz_cam[:, 2] > 0.2
            z = np.clip(xyz_cam[:, 2], 0.001, None)
            K = np.asarray(camera.intrinsics)
            fx, fy = K[0, 0], K[1, 1]
            x = xyz_cam[:, 0] / z * fx + camera.image_width / 2.0
            y = xyz_cam[:, 1] / z * fy + camera.image_height / 2.0
            in_screen = (
                (x >= -0.15 * camera.image_width)
                & (x <= 1.15 * camera.image_width)
                & (y >= -0.15 * camera.image_height)
                & (y <= 1.15 * camera.image_height)
            )
            valid = valid_depth & in_screen
            distance[valid] = np.minimum(distance[valid], z[valid])
            valid_points |= valid
            focal_length = max(focal_length, fx)
        if valid_points.any():
            distance[~valid_points] = distance[valid_points].max()
        filter_3d = distance / focal_length * (0.2**0.5)
        self.filter_3D = filter_3d[..., None].astype(np.float32)
        return self.filter_3D
