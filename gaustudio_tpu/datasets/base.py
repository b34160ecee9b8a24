"""Dataset base class: a sequence of Cameras + scene normalization.

The torch-free counterpart of the reference's ``torch.utils.data.Dataset``
subclasses (e.g. gaustudio/datasets/colmap.py:169-180): plain sequence
protocol plus the shared export/downsample helpers every loader repeats.
"""

from __future__ import annotations

import json
from typing import Dict, List

from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.datasets.utils import camera_to_JSON, getNerfppNorm


class CameraDataset:
    all_cameras: List[Camera]

    def __len__(self):
        return len(self.all_cameras)

    def __getitem__(self, index):
        return self.all_cameras[index]

    def __iter__(self):
        return iter(self.all_cameras)

    def finalize(self):
        """Sort by image name + compute nerf++ normalization (the tail every
        reference loader shares, e.g. colmap.py:155-160)."""
        self.all_cameras = sorted(self.all_cameras, key=lambda x: x.image_name or "")
        self.nerf_normalization = getNerfppNorm(self.all_cameras)
        self.cameras_extent = self.nerf_normalization["radius"]
        self.cameras_center = self.nerf_normalization["translate"]
        self.cameras_min_extent = self.nerf_normalization["min_radius"]

    def downsample_scale(self, resolution_scale):
        """colmap.py:44-45."""
        self.all_cameras = [c.downsample_scale(resolution_scale) for c in self.all_cameras]
        return self

    def export(self, save_path):
        """Write cameras.json (colmap.py:162-168)."""
        json_cams = [camera_to_JSON(i, cam) for i, cam in enumerate(self.all_cameras)]
        with open(save_path, "w") as f:
            json.dump(json_cams, f)
