"""GeneralPointCloud — plain xyz/rgb/normal cloud.

Port of gaustudio/models/general_pcd.py:8-37.
"""

from __future__ import annotations

import numpy as np

from gaustudio_tpu import models
from gaustudio_tpu.models.base import BasePointCloud
from gaustudio_tpu.utils import ply as plyio


@models.register("general_pcd")
class GeneralPointCloud(BasePointCloud):
    default_conf = {
        "attributes": {"xyz": 3, "rgb": 3, "normal": 3},
    }

    def export(self, path):
        """general_pcd.py:18-37: xyz + normals + u8 RGB ply."""
        xyz = np.asarray(self._xyz)
        rgb = np.clip(np.asarray(self._rgb) * 255.0, 0, 255).astype(np.uint8)
        normal = (
            np.asarray(self._normal)
            if getattr(self, "_normal", None) is not None and len(np.asarray(self._normal))
            else np.zeros_like(xyz)
        )
        plyio.store_ply(path, xyz, rgb, normal)
        print(f"Exported {len(xyz)} points to {path}")
