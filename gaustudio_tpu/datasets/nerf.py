"""NeRF-synthetic (Blender transforms_*.json) dataset loader.

Port of gaustudio/datasets/nerf.py:14-87 (NerfDataset); the OpenGL->COLMAP
axis flip ``c2w[:,1:3] *= -1`` (nerf.py:50) is preserved.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict

import numpy as np

from gaustudio_tpu import datasets
from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.datasets.base import CameraDataset
from gaustudio_tpu.datasets.utils import focal2fov


@datasets.register("nerf")
class NerfDataset(CameraDataset):
    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        self.image_path = Path(config["source_path"])
        self.split = config.get("split", "train")
        self.load_images = config.get("load_images", True)
        self.white_background = config.get("white_background", False)
        self._initialize()
        self.ply_path = None

    def _initialize(self):
        with open(self.source_path / f"transforms_{self.split}.json") as f:
            meta = json.load(f)

        if "w" in meta and "h" in meta:
            width, height = int(meta["w"]), int(meta["h"])
        else:
            width, height = 800, 800
        focal = 0.5 * width / math.tan(0.5 * meta["camera_angle_x"])
        FoVy = focal2fov(focal, height)
        FoVx = focal2fov(focal, width)

        cams = []
        for frame in meta["frames"]:
            image_name = f"{frame['file_path']}.png"
            image_path = self.image_path / image_name
            c2w = np.array(frame["transform_matrix"])
            c2w[:, 1:3] *= -1
            extr = np.linalg.inv(c2w)
            R = np.transpose(extr[:3, :3])
            T = extr[:3, 3]
            cam = Camera(
                R=R, T=T, FoVx=FoVx, FoVy=FoVy,
                image_name=image_name,
                image_width=width, image_height=height,
            )
            if self.load_images and image_path.exists():
                # alpha-composite RGBA renders over the training background
                bg = np.ones(3, np.float32) if self.white_background else None
                cam.load_image(str(image_path), bg_color=bg)
                cam._setup()
            cams.append(cam)
        self.all_cameras = cams
        self.finalize()
