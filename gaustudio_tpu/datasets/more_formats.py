"""The long tail of dataset formats.

Ports of the remaining reference loaders: nerfstudio/mushroom
(datasets/nerfstudio.py), neus (neus.py), nsvf (nsvf.py), deepvoxels
(deepvoxels.py), scannet (scannet.py), polycam (polycam.py), kiri/navi/
rtmv/trellis (nerf.py:87-350), mobilebrick (mobilebrick.py), mvsnet
(mvsnet.py), nero (nero.py), nisr (nisr.py), waymo (waymo.py).  Each parses
its format into a list of Cameras and applies the shared nerf++
normalization tail.
"""

from __future__ import annotations

import json
import os
import pickle
from pathlib import Path
from typing import Dict

import numpy as np

from gaustudio_tpu import datasets
from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.datasets.base import CameraDataset
from gaustudio_tpu.datasets.utils import focal2fov


def _imread_rgb(path):
    import cv2

    img = cv2.imread(str(path))
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def _read_mask(path, width, height):
    import cv2

    mask = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    _, mask = cv2.threshold(mask, 1, 255, cv2.THRESH_BINARY)
    mask = cv2.resize(mask, (width, height))
    return mask.astype(np.float32) / 255.0


def _c2w_to_rt(c2w):
    extr = np.linalg.inv(c2w)
    return np.transpose(extr[:3, :3]), extr[:3, 3]


@datasets.register("nerfstudio")
class NerfStudioDataset(CameraDataset):
    """datasets/nerfstudio.py:13-120: transforms.json with per-frame
    intrinsics, optional masks and depths."""

    transform_path = "transforms.json"

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        self.image_path = self.source_path
        self.masks_dir = self.source_path
        self.white_background = config.get("white_background", False)
        self.w_mask = config.get("w_mask", False)
        self._initialize()

    def _initialize(self):
        import cv2

        with open(self.source_path / self.transform_path) as f:
            meta = json.load(f)
        cams = []
        for frame in meta["frames"]:
            width, height = int(frame["w"]), int(frame["h"])
            fx, fy = frame["fl_x"], frame["fl_y"]
            cx, cy = frame["cx"], frame["cy"]
            image_path = self.image_path / frame["file_path"]
            image = _imread_rgb(image_path)

            mask = None
            bg_image = None
            if self.w_mask and "mask_path" in frame:
                mp = self.masks_dir / frame["mask_path"]
                if mp.exists():
                    mask = _read_mask(mp, width, height)
                    bg_image = image * (1.0 - mask[..., None])
            if bg_image is None:
                bg_image = (
                    np.ones((height, width, 3), np.float32)
                    if self.white_background
                    else np.zeros((height, width, 3), np.float32)
                )

            depth = None
            if "depth_file_path" in frame:
                dp = self.image_path / frame["depth_file_path"]
                if dp.exists():
                    depth = (
                        cv2.imread(str(dp), cv2.IMREAD_UNCHANGED).astype(np.float32)
                        / 1000.0
                    )

            c2w = np.array(frame["transform_matrix"])
            c2w[:, 1:3] *= -1
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(
                    R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                    image_name=frame["file_path"], image=image, bg_image=bg_image,
                    mask=mask, depth=depth, image_width=width, image_height=height,
                    principal_point_ndc=(cx / width, cy / height),
                )
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("mushroom")
class MuSHRoomDataset(NerfStudioDataset):
    """datasets/nerfstudio.py:122-132 (MuSHRoom: colmap-aligned transforms)."""

    transform_path = "transformations_colmap.json"


def load_K_Rt_from_P(P):
    """datasets/neus.py:12-26: decompose a 3x4 projection matrix."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


@datasets.register("neus")
class NeusDataset(CameraDataset):
    """datasets/neus.py:28-108: cameras_sphere.npz world/scale matrices."""

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        self.image_path = self.source_path / "image"
        self.mask_path = self.source_path / "mask"
        self.cams_path = self.source_path / "cameras_sphere.npz"
        self.w_mask = config.get("w_mask", False)
        self._initialize()

    def _initialize(self):
        cams_npz = np.load(self.cams_path)
        n_images = max(int(k.split("_")[-1]) for k in cams_npz.keys()) + 1
        cams = []
        for i in range(n_images):
            image_name = f"{i:06d}.png"
            image = _imread_rgb(self.image_path / image_name)
            height, width = image.shape[:2]
            mask = None
            mp = self.mask_path / f"{i:03d}.png"
            if self.w_mask and mp.exists():
                mask = _read_mask(mp, width, height)
                image = image * mask[..., None]
            P = (cams_npz[f"world_mat_{i}"] @ cams_npz[f"scale_mat_{i}"])[:3, :4]
            K, c2w = load_K_Rt_from_P(P)
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, mask=mask, image_name=image_name,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


class _PoseDirDataset(CameraDataset):
    """Shared shape of nsvf/deepvoxels: rgb/ + pose/*.txt + intrinsics.txt."""

    image_subdir = "rgb"
    name_filter = None

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        self.image_dir = self.source_path / self.image_subdir
        self.pose_dir = self.source_path / "pose"
        self.intrinsic_path = self.source_path / "intrinsics.txt"
        files = os.listdir(self.image_dir)
        if self.name_filter:
            files = [f for f in files if f.startswith(self.name_filter)]
        self.image_filenames = sorted(
            [self.image_dir / f for f in files],
            key=lambda fn: str(fn.stem).split("_")[-1],
        )
        self._initialize()

    def _initialize(self):
        with open(self.intrinsic_path) as f:
            vals = f.readline().split()
            fx = fy = float(vals[0])
            cx, cy = float(vals[1]), float(vals[2])
        cams = []
        for image_path in self.image_filenames:
            _id = image_path.stem
            image = _imread_rgb(image_path)
            height, width = image.shape[:2]
            c2w = np.loadtxt(self.pose_dir / f"{_id}.txt").reshape(4, 4)
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, image_name=image_path.name,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("nsvf")
class NSVFDataset(_PoseDirDataset):
    """datasets/nsvf.py:11-70 (0_train split)."""

    name_filter = "0_train"


@datasets.register("deepvoxels")
class DeepVoxelsDataset(_PoseDirDataset):
    """datasets/deepvoxels.py:11-67."""

    name_filter = None


@datasets.register("scannet")
class ScannetDataset(CameraDataset):
    """datasets/scannet.py:13-84: color/ depth/ pose/ + intrinsic_color.txt."""

    def __init__(self, config: Dict):
        import cv2

        self.source_path = Path(config["source_path"])
        image_dir = self.source_path / "color"
        pose_dir = self.source_path / "pose"
        depth_dir = self.source_path / "depth"
        intr = np.loadtxt(self.source_path / "intrinsic" / "intrinsic_color.txt")
        fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]
        files = sorted(os.listdir(image_dir), key=lambda fn: int(Path(fn).stem))
        cams = []
        for fname in files:
            _id = int(Path(fname).stem)
            image = _imread_rgb(image_dir / fname)
            height, width = image.shape[:2]
            depth = (
                cv2.imread(str(depth_dir / f"{_id}.png"), cv2.IMREAD_UNCHANGED)
                .astype(np.float32) / 1000.0
            )
            c2w = np.loadtxt(pose_dir / f"{_id}.txt")
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, depth=depth, image_name=fname,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        # reference sorts numerically (scannet.py:62-63)
        self.all_cameras.sort(key=lambda c: int(Path(c.image_name).stem))
        from gaustudio_tpu.datasets.utils import getNerfppNorm

        self.nerf_normalization = getNerfppNorm(self.all_cameras)
        self.cameras_extent = self.nerf_normalization["radius"]
        self.cameras_center = self.nerf_normalization["translate"]
        self.cameras_min_extent = self.nerf_normalization["min_radius"]


@datasets.register("polycam")
class PolycamDataset(CameraDataset):
    """datasets/polycam.py:11-74: keyframes/corrected_{images,cameras}."""

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        image_dir = self.source_path / "keyframes" / "corrected_images"
        cameras_dir = self.source_path / "keyframes" / "corrected_cameras"
        files = sorted(os.listdir(image_dir), key=lambda fn: int(Path(fn).stem))
        cams = []
        for fname in files:
            fid = int(Path(fname).stem)
            fj = json.load(open(cameras_dir / f"{fid}.json"))
            width, height = fj["width"], fj["height"]
            fx, fy, cx, cy = fj["fx"], fj["fy"], fj["cx"], fj["cy"]
            c2w = np.array(
                [
                    [fj["t_20"], fj["t_21"], fj["t_22"], fj["t_23"]],
                    [fj["t_00"], fj["t_01"], fj["t_02"], fj["t_03"]],
                    [fj["t_10"], fj["t_11"], fj["t_12"], fj["t_13"]],
                    [0, 0, 0, 1],
                ],
                dtype=np.float32,
            )
            c2w[..., 2] *= -1
            c2w[..., 1] *= -1
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image_path=str(image_dir / fname), image_name=fname,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("kiri")
class KiriDataset(CameraDataset):
    """datasets/nerf.py:217-267: KIRI Engine transforms.json."""

    def __init__(self, config: Dict):
        import cv2

        self.source_path = Path(config["source_path"])
        with open(self.source_path / "transforms.json") as f:
            meta = json.load(f)
        cams = []
        for frame in meta["frames"]:
            image_name = frame["file_path"].lstrip("./")
            width, height = int(frame["w"]), int(frame["h"])
            fx, fy = frame["fl_x"], frame["fl_y"]
            cx, cy = frame["cx"], frame["cy"]
            c2w = np.array(frame["transform_matrix"])
            c2w[:, 1:3] *= -1
            R, T = _c2w_to_rt(c2w)
            depth = None
            if "depth_file_path" in frame:
                dp = self.source_path / frame["depth_file_path"].lstrip("./")
                if dp.exists():
                    depth = cv2.imread(str(dp), -1).astype(np.float32) / 1000.0
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image_path=str(self.source_path / image_name),
                       image_name=image_name, depth=depth,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


def _quat_to_rotmat_wxyz(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


@datasets.register("navi")
class NAVIDataset(CameraDataset):
    """datasets/nerf.py:164-215: annotations.json with quaternion poses."""

    def __init__(self, config: Dict):
        import cv2

        self.source_path = Path(config["source_path"])
        image_dir = self.source_path / "images"
        with open(self.source_path / "annotations.json") as f:
            annotations = json.load(f)
        cams = []
        for anno in annotations:
            image_name = anno["filename"]
            mask = cv2.imread(
                str(self.source_path / "masks" / image_name.replace(".jpg", ".png")), -1
            )
            depth = cv2.imread(
                str(self.source_path / "depth" / image_name.replace(".jpg", ".png")), -1
            )
            mask = None if mask is None else mask.astype(np.float32) / 255.0
            depth = None if depth is None else depth.astype(np.float32) / 1000.0
            focal = anno["camera"]["focal_length"]
            width, height = anno["image_size"]
            c2w = np.eye(4)
            c2w[:3, :3] = _quat_to_rotmat_wxyz(np.array(anno["camera"]["q"]))
            c2w[:3, 3] = np.array(anno["camera"]["t"])
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(focal, width),
                       FoVy=focal2fov(focal, height),
                       image_path=str(image_dir / image_name), image_name=image_name,
                       mask=mask, depth=depth,
                       image_width=width, image_height=height)
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("mobilebrick")
class MobileBrickDataset(CameraDataset):
    """datasets/mobilebrick.py:12-93: per-frame intrinsic/pose txt files."""

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        image_dir = self.source_path / "image"
        mask_dir = self.source_path / "mask"
        pose_dir = self.source_path / "pose"
        intr_dir = self.source_path / "intrinsic"
        self.w_mask = config.get("w_mask", False)
        files = sorted(os.listdir(image_dir), key=lambda fn: int(Path(fn).stem))
        cams = []
        for fname in files:
            _id = Path(fname).stem
            image = _imread_rgb(image_dir / fname)
            height, width = image.shape[:2]
            intr = np.loadtxt(intr_dir / f"{_id}.txt")
            fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]
            c2w = np.loadtxt(pose_dir / f"{_id}.txt")
            R, T = _c2w_to_rt(c2w)
            mask = None
            mp = mask_dir / f"{_id}.png"
            if self.w_mask and mp.exists():
                mask = _read_mask(mp, width, height)
                image = image * mask[..., None]
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, mask=mask, image_name=fname,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


def load_cam_mvsnet(file, max_d=256, interval_scale=1):
    """datasets/mvsnet.py:12-50: MVSNet cam.txt (extrinsic + intrinsic)."""
    with open(file) as f:
        words = f.read().split()
    extrinsic = np.array([float(words[4 * i + j + 1]) for i in range(4)
                          for j in range(4)]).reshape(4, 4)
    intrinsic = np.array([float(words[3 * i + j + 18]) for i in range(3)
                          for j in range(3)]).reshape(3, 3)
    return extrinsic, intrinsic


@datasets.register("mvsnet")
class MvsnetDataset(CameraDataset):
    """datasets/mvsnet.py:52-115: blended_images/ + cams/*_cam.txt."""

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        image_dir = self.source_path / "blended_images"
        if not image_dir.exists():
            image_dir = self.source_path / "images"
        if not image_dir.exists():
            raise ValueError("No image directory found")
        cam_dir = self.source_path / "cams"
        files = sorted(os.listdir(image_dir), key=lambda fn: int(Path(fn).stem))
        cams = []
        for fname in files:
            _id = int(Path(fname).stem)
            image = _imread_rgb(image_dir / fname)
            height, width = image.shape[:2]
            w2c, K = load_cam_mvsnet(cam_dir / f"{_id:08d}_cam.txt")
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            R = np.transpose(w2c[:3, :3])
            T = w2c[:3, 3]
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, image_name=fname,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("nero")
class NeRODataset(CameraDataset):
    """datasets/nero.py:12-71: per-image {id}-camera.pkl (w2c + K)."""

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        ids = sorted(int(f.stem.split("-")[0]) for f in self.source_path.glob("*-camera.pkl"))
        cams = []
        for _id in ids:
            with open(self.source_path / f"{_id}-camera.pkl", "rb") as f:
                cam = pickle.load(f)
            image_path = self.source_path / f"{_id}.png"
            image = _imread_rgb(image_path)
            height, width = image.shape[:2]
            extr = np.eye(4)
            extr[:3, :] = cam[0].astype(np.float32)
            K = cam[1].astype(np.float32)
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            R = np.transpose(extr[:3, :3])
            T = extr[:3, 3]
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, image_name=f"{_id}.png",
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


def load_from_log(file_path):
    """datasets/nisr.py:12-29: camera.log blocks (id, K, 4x4 c2w)."""
    with open(file_path) as f:
        content = f.readlines()
    image_ids, intrinsics, extrinsics = [], [], []
    for line in range(0, len(content), 7):
        image_ids.append(int(content[line]))
        intrinsics.append([float(v) for v in content[line + 1].split()])
        extrinsics.append([[float(v) for v in content[line + 3 + r].split()]
                           for r in range(4)])
    return image_ids, intrinsics, extrinsics


@datasets.register("nisr")
class NisrDataset(CameraDataset):
    """datasets/nisr.py:31-108."""

    def __init__(self, config: Dict):
        self.source_path = Path(config["source_path"])
        image_path = self.source_path / "images"
        mask_path = self.source_path / "mask"
        self.w_mask = config.get("w_mask", False)
        image_ids, intrinsics, extrinsics = load_from_log(self.source_path / "camera.log")
        cams = []
        for _id, K, c2w in zip(image_ids, intrinsics, extrinsics):
            image_name = f"{_id}.png"
            image = _imread_rgb(image_path / image_name)
            height, width = image.shape[:2]
            mask = None
            mp = mask_path / image_name
            if self.w_mask and mp.exists():
                mask = _read_mask(mp, width, height)
                image = image * mask[..., None]
            fx, fy, cx, cy = K[0], K[1], K[2], K[3]
            R, T = _c2w_to_rt(np.array(c2w))
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, mask=mask, image_name=image_name,
                       image_width=width, image_height=height,
                       principal_point_ndc=(cx / width, cy / height))
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("waymo")
class WaymoDataset(CameraDataset):
    """datasets/waymo.py:12-132: scenario.pt pickle with per-camera frames."""

    CAMERAS = ["camera_FRONT", "camera_FRONT_LEFT", "camera_FRONT_RIGHT",
               "camera_SIDE_LEFT", "camera_SIDE_RIGHT"]

    def __init__(self, config: Dict):
        self.path = Path(config["source_path"])
        self.camera_number = config.get("camera_number", 1)
        self.eval = config.get("eval", False)
        with open(self.path / "scenario.pt", "rb") as f:
            scenario_data = pickle.load(f)
        cams = []
        for camera_id in self.CAMERAS[: self.camera_number]:
            camera_data = scenario_data["observers"][camera_id]
            frames = camera_data["data"]
            for idx in range(camera_data["n_frames"]):
                image_path = self.path / "images" / camera_id / f"{idx:08d}.jpg"
                height, width = frames["hw"][idx]
                intr = frames["intr"][idx]
                fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]
                c2w = np.asarray(frames["c2w"][idx])
                R, T = _c2w_to_rt(c2w)
                cams.append(
                    Camera(R=R, T=T, FoVx=focal2fov(fx, width),
                           FoVy=focal2fov(fy, height),
                           image_path=str(image_path) if image_path.exists() else None,
                           image_name=f"{camera_id}/{idx:08d}.jpg",
                           image_width=int(width), image_height=int(height),
                           principal_point_ndc=(cx / width, cy / height))
                )
        self.all_cameras = cams
        self.finalize()


def _linear_to_srgb(img):
    """datasets/nerf.py:79-84."""
    out = np.where(img > 0.0031308, 1.055 * np.clip(img, 1e-8, None) ** (1 / 2.4) - 0.055,
                   12.92 * img)
    return np.clip(out, 0, 1)


@datasets.register("rtmv")
class RTMVDataset(CameraDataset):
    """datasets/nerf.py:87-155: EXR renders + per-frame camera json."""

    def __init__(self, config: Dict):
        import cv2

        os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
        self.source_path = Path(config["source_path"])
        split_json = self.source_path / f"transforms_{config.get('split', 'train')}.json"
        if split_json.exists():
            with open(split_json) as f:
                frames = json.load(f)["frames"]
        else:
            frames = [{"file_path": str(p).split(".")[0]}
                      for p in self.source_path.glob("*.depth.exr")]
        cams = []
        for frame in frames:
            stem = frame["file_path"]
            image = cv2.imread(f"{stem}.exr", -1)
            if image is None:
                continue
            image = _linear_to_srgb(cv2.cvtColor(image, cv2.COLOR_BGR2RGB))
            seg = cv2.imread(f"{stem}.seg.exr", -1)
            mask = (seg[..., 0] < 1e6).astype(np.float32) if seg is not None else None
            cd = json.load(open(f"{stem}.json"))["camera_data"]
            ci = cd["intrinsics"]
            width, height = cd["width"], cd["height"]
            c2w = np.array(cd["cam2world"]).T
            c2w[:, 1:3] *= -1
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(ci["fx"], width),
                       FoVy=focal2fov(ci["fy"], height),
                       image=image.astype(np.float32), mask=mask,
                       image_name=os.path.basename(stem),
                       image_width=width, image_height=height,
                       principal_point_ndc=(ci["cx"] / width, ci["cy"] / height))
            )
        self.all_cameras = cams
        self.finalize()


@datasets.register("trellis")
class TrellisDataset(CameraDataset):
    """datasets/nerf.py:269-350: Trellis transforms.json (EXR frames)."""

    def __init__(self, config: Dict):
        import cv2

        os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
        self.source_path = Path(config["source_path"])
        with open(self.source_path / "transforms.json") as f:
            meta = json.load(f)
        cams = []
        for frame in meta["frames"]:
            image_path = self.source_path / frame["file_path"]
            image = cv2.imread(str(image_path), -1)
            if image is None:
                continue
            if image.dtype != np.uint8:
                image = _linear_to_srgb(image)
            else:
                image = image.astype(np.float32) / 255.0
            image = cv2.cvtColor(image[..., :3].astype(np.float32), cv2.COLOR_BGR2RGB)
            height, width = image.shape[:2]
            if "camera_angle_x" in meta:
                import math

                focal = 0.5 * width / math.tan(0.5 * meta["camera_angle_x"])
                fx = fy = focal
            else:
                fx, fy = frame["fl_x"], frame["fl_y"]
            c2w = np.array(frame["transform_matrix"])
            c2w[:, 1:3] *= -1
            R, T = _c2w_to_rt(c2w)
            cams.append(
                Camera(R=R, T=T, FoVx=focal2fov(fx, width), FoVy=focal2fov(fy, height),
                       image=image, image_name=frame["file_path"],
                       image_width=width, image_height=height)
            )
        self.all_cameras = cams
        self.finalize()
