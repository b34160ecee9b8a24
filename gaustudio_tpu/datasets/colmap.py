"""COLMAP dataset loader.

Port of gaustudio/datasets/colmap.py:20-180: bin/txt model parsing,
PINHOLE / SIMPLE_PINHOLE / OPENCV intrinsics, per-image mask/depth
side-channels, principal-point NDC, threaded image loading.
"""

from __future__ import annotations

import os
import warnings
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict

import numpy as np

from gaustudio_tpu import datasets
from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.datasets.base import CameraDataset
from gaustudio_tpu.datasets.utils import (
    focal2fov,
    qvec2rotmat,
    read_extrinsics_binary,
    read_extrinsics_text,
    read_intrinsics_binary,
    read_intrinsics_text,
)


@datasets.register("colmap")
class ColmapDataset(CameraDataset):
    def __init__(self, config: Dict):
        if "source_path" not in config:
            raise ValueError("Config must contain 'source_path' key")
        self.path = Path(config["source_path"])
        self.white_background = config.get("white_background", False)
        self.images_dir = self.path / config.get("images", "images")
        self.sparse_dir = self.path / config.get("sparse", "sparse")
        self.depths_dir = self.path / config.get("depths", "depths")
        self.resolution = config.get("resolution", 1)
        if config.get("masks") is not None:
            self.masks_dir = self.path / config["masks"]
            self.w_mask = True
        else:
            self.masks_dir = None
            self.w_mask = config.get("w_mask", False)
        self.eval = config.get("eval", False)
        self._initialize()

    def _initialize(self):
        scene_dir = os.path.join(self.path, "sparse", "0")
        if not os.path.exists(scene_dir):
            scene_dir = os.path.join(self.path, self.sparse_dir)
        try:
            cam_extrinsics = read_extrinsics_binary(os.path.join(scene_dir, "images.bin"))
            cam_intrinsics = read_intrinsics_binary(os.path.join(scene_dir, "cameras.bin"))
        except (FileNotFoundError, OSError):
            cam_extrinsics = read_extrinsics_text(os.path.join(scene_dir, "images.txt"))
            cam_intrinsics = read_intrinsics_text(os.path.join(scene_dir, "cameras.txt"))

        def process_camera(key):
            import cv2

            extr = cam_extrinsics[key]
            intr = cam_intrinsics[extr.camera_id]
            height, width = intr.height, intr.width
            R = np.transpose(qvec2rotmat(extr.qvec))
            T = np.array(extr.tvec)

            if intr.model == "SIMPLE_PINHOLE":
                fx = fy = intr.params[0]
                cx, cy = intr.params[1], intr.params[2]
            elif intr.model in ("PINHOLE", "OPENCV"):
                if intr.model == "OPENCV":
                    warnings.warn(
                        "OpenCV camera model detected; distortion parameters "
                        "are discarded — undistort your images first.",
                        UserWarning,
                    )
                fx, fy = intr.params[0], intr.params[1]
                cx, cy = intr.params[2], intr.params[3]
            else:
                raise AssertionError(
                    "Colmap camera model not handled: only undistorted datasets "
                    "(PINHOLE or SIMPLE_PINHOLE cameras) supported!"
                )
            FoVx = focal2fov(fx, width)
            FoVy = focal2fov(fy, height)

            image_path = self.images_dir / os.path.basename(extr.name)
            if not image_path.exists():
                return None
            bgr = cv2.imread(str(image_path))
            height, width = bgr.shape[:2]
            image = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

            depth = None
            depth_path = self.depths_dir / (os.path.basename(extr.name)[:-4] + ".png")
            if depth_path.exists():
                depth = (
                    cv2.imread(str(depth_path), cv2.IMREAD_UNCHANGED).astype(np.float32)
                    / 1000.0
                )

            mask = None
            bg_image = None
            if self.w_mask and self.masks_dir is not None:
                stem = os.path.basename(extr.name).split(".")[0]
                for ext in (".png", ".jpg"):
                    mp = self.masks_dir / (stem + ext)
                    if mp.exists():
                        m = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
                        _, m = cv2.threshold(m, 1, 255, cv2.THRESH_BINARY)
                        m = cv2.resize(m, (width, height))
                        mask = m.astype(np.float32) / 255.0
                        bg = cv2.bitwise_and(bgr, bgr, mask=cv2.bitwise_not(m))
                        bg_image = cv2.cvtColor(bg, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
                        break
            if mask is None:
                mask = np.ones((height, width), np.float32)
                bg_image = (
                    np.ones((height, width, 3), np.float32)
                    if self.white_background
                    else np.zeros((height, width, 3), np.float32)
                )

            cam = Camera(
                R=R, T=T, FoVx=FoVx, FoVy=FoVy,
                image_name=os.path.basename(extr.name),
                image_width=width, image_height=height,
                principal_point_ndc=(cx / width, cy / height),
                image=image, bg_image=bg_image, mask=mask, depth=depth,
            )
            if self.resolution > 1:
                cam.downsample_scale(self.resolution)
            return cam

        with ThreadPoolExecutor(max_workers=os.cpu_count()) as ex:
            cams = [c for c in ex.map(process_camera, cam_extrinsics) if c is not None]
        self.all_cameras = cams
        self.finalize()
