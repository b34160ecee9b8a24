"""Camera path tooling: orbits, cubemaps, validation, smoothing, resampling.

Port of gaustudio/cameras/camera_paths.py:27-331.  (NB the reference's
``gaustudio/cameras/__init__.py`` is empty, so its ``--flythrough`` path
NameErrors — SURVEY.md §2.2; here the module is actually importable.)
"""

from __future__ import annotations

import copy
import json
import math
from typing import List

import numpy as np

from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.datasets.utils import JSON_to_camera
from gaustudio_tpu.utils.pose import (
    get_interpolated_poses,
    quaternion_from_matrix,
    quaternion_matrix,
)


def safe_normalize(x, eps=1e-20):
    x = np.asarray(x, np.float64)
    return x / np.sqrt(np.maximum((x * x).sum(-1, keepdims=True), eps))


def look_at(campos, target, opengl=True):
    """camera_paths.py:27-58: rotation whose columns are (right, up, forward)."""
    campos = np.asarray(campos, np.float64)
    target = np.asarray(target, np.float64)
    if not opengl:
        forward = safe_normalize(target - campos)
    else:
        forward = safe_normalize(campos - target)
    up = np.array([0, 1, 0], np.float64)
    right = np.cross(up, forward)
    if np.linalg.norm(right) < 1e-6:
        up = np.array([1, 0, 0], np.float64)
        right = np.cross(up, forward)
    right = safe_normalize(right)
    up = safe_normalize(np.cross(forward, right))
    return np.stack([right, up, forward], axis=1)


def orbit_camera(elevation, azimuth, radius=1, is_degree=True, target=None,
                 opengl=True):
    """camera_paths.py:60-87: c2w pose orbiting a target."""
    if is_degree:
        elevation = np.deg2rad(elevation)
        azimuth = np.deg2rad(azimuth)
    x = radius * np.cos(elevation) * np.sin(azimuth)
    y = radius * np.sin(elevation)
    z = radius * np.cos(elevation) * np.cos(azimuth)
    if target is None:
        target = np.zeros(3, np.float64)
    campos = np.array([x, y, z]) + target
    T = np.eye(4)
    T[:3, :3] = look_at(campos, target, opengl)
    T[:3, 3] = campos
    return T


def get_path_from_orbit(cam_center, cam_radius, elevation=0, num_cam=36,
                        image_size=1024, fov_deg=49.1) -> List[Camera]:
    """camera_paths.py:89-102: num_cam azimuth steps around the target.

    NB the reference passes the RAW w2c rotation to ``Camera(R=...)``,
    but the Inria camera convention (datasets/utils.py:113-118
    getWorld2View2) stores R as the c2w rotation — so the reference's
    orbit cameras end up with transposed orientations: still radius-r
    views of the target, but at scrambled elevations (a nominal
    12-degree ring dips to -12). Fixed here: R = w2c^T."""
    cameras = []
    for _id, azi in enumerate(np.arange(0, 360, 360 // num_cam, dtype=np.int32)):
        pose = orbit_camera(elevation, float(azi), radius=cam_radius,
                            target=np.asarray(cam_center), opengl=False)
        w2c = np.linalg.inv(pose)
        R, T = w2c[:3, :3], w2c[:3, 3]
        cameras.append(
            Camera(R=np.transpose(R), T=T, FoVx=math.radians(fov_deg),
                   FoVy=math.radians(fov_deg), image_name=f"{_id}",
                   image_width=image_size, image_height=image_size)
        )
    return cameras


def get_path_from_cubemap(cam_center, cam_radius, image_size=1024) -> List[Camera]:
    """camera_paths.py:104-140: six axis-aligned views."""
    cam_center = np.asarray(cam_center, np.float64)
    views = {
        "front": np.array([0, 0, cam_radius]),
        "back": np.array([0, 0, -cam_radius]),
        "left": np.array([-cam_radius, 0, 0]),
        "right": np.array([cam_radius, 0, 0]),
        "top": np.array([0, cam_radius, 0]),
        "bottom": np.array([0, -cam_radius, 0]),
    }
    cameras = []
    for name, offset in views.items():
        campos = cam_center + offset
        T = np.eye(4)
        T[:3, :3] = look_at(campos, cam_center, opengl=False)
        T[:3, 3] = campos
        T[:3, 1] *= -1
        w2c = np.linalg.inv(T)
        cameras.append(
            Camera(R=w2c[:3, :3].T, T=w2c[:3, 3], FoVx=math.radians(49.1),
                   FoVy=math.radians(49.1), image_name=name,
                   image_width=image_size, image_height=image_size)
        )
    return cameras


def get_path_from_json(json_path) -> List[Camera]:
    """camera_paths.py:144-152."""
    with open(json_path) as f:
        camera_data = json.load(f)
    return [JSON_to_camera(cj) for cj in camera_data]


def upsample_cameras_velocity(cameras, meters_per_frame=0.1, angles_per_frame=1):
    """camera_paths.py:154-187: slerp resample to target linear/angular speed."""
    new_cameras = []
    total_idx = 0
    for idx in range(len(cameras) - 1):
        cur, nxt = cameras[idx], cameras[idx + 1]
        ce, ne = np.asarray(cur.extrinsics), np.asarray(nxt.extrinsics)
        d_t = np.linalg.norm(ne[:3, 3] - ce[:3, 3])
        d_r = np.rad2deg(
            np.arccos(np.clip((np.trace(ce[:3, :3].T @ ne[:3, :3]) - 1) / 2, -1, 1))
        )
        steps = max(max(int(d_t / meters_per_frame), 1), max(int(d_r / angles_per_frame), 1))
        for pose in get_interpolated_poses(ce, ne, steps=steps):
            cam = copy.deepcopy(cur)
            cam.extrinsics = pose
            cam.image_name = str(total_idx).zfill(8)
            new_cameras.append(cam)
            total_idx += 1
    return new_cameras


def downsample_cameras(cameras, translation_threshold=0.1, rotation_threshold=15,
                       min_samples=10):
    """camera_paths.py:188-235: keyframe selection by pose delta."""
    if len(cameras) <= min_samples:
        return cameras
    rotation_threshold = np.deg2rad(rotation_threshold)
    out = []
    prev = None
    for cam in cameras:
        if prev is None:
            out.append(cam)
            prev = cam
            continue
        ce, pe = np.asarray(cam.extrinsics), np.asarray(prev.extrinsics)
        d_t = np.linalg.norm(ce[:3, 3] - pe[:3, 3])
        d_r = np.arccos(np.clip((np.trace(pe[:3, :3].T @ ce[:3, :3]) - 1) / 2, -1, 1))
        if d_t > translation_threshold or d_r > rotation_threshold:
            out.append(cam)
            prev = cam
    return out if len(out) >= min_samples else cameras


def validate_paths(cameras, window_size_ratio=0.1, speed_tolerance=0.2,
                   discard_outliers=False, return_invalid=False):
    """camera_paths.py:239-294: sliding-window speed-outlier rejection."""
    valid, invalid = [], []
    prev = None
    n = len(cameras)
    window = max(3, int(n * window_size_ratio))
    positions = [np.asarray(c.extrinsics)[:3, 3] for c in cameras]
    for i, cam in enumerate(cameras):
        if prev is None:
            valid.append(cam)
            prev = cam
            continue
        speed = np.linalg.norm(positions[i] - positions[i - 1])
        w0 = max(0, i - window)
        speeds = [
            np.linalg.norm(positions[j] - positions[max(0, j - 1)])
            for j in range(w0, i + 1)
        ]
        threshold = np.mean(speeds) * (1 + speed_tolerance)
        if speed > threshold:
            if not discard_outliers:
                invalid.append(cam)
        else:
            valid.append(cam)
        prev = cam
    if return_invalid:
        return valid, invalid
    return valid


def unwrap_quaternions(qvecs):
    """camera_paths.py:299-305: hemisphere-consistent quaternion sequence."""
    out = np.zeros_like(qvecs)
    out[0] = qvecs[0]
    for i in range(1, qvecs.shape[0]):
        dot = np.clip(np.sum(out[i - 1] * qvecs[i]), -1.0, 1.0)
        out[i] = qvecs[i] if dot > 0 else -qvecs[i]
    return out


def smoothen_cameras(cameras, window_size_ratio=0.1, polyorder=2):
    """camera_paths.py:307-331: Savitzky-Golay smoothing of the trajectory."""
    from scipy.signal import savgol_filter

    n = len(cameras)
    window = max(3, int(n * window_size_ratio))
    if window <= polyorder:
        window = polyorder + 1
    translates = np.stack([np.asarray(c.extrinsics)[:3, 3] for c in cameras])
    qvecs = np.stack(
        [quaternion_from_matrix(np.asarray(c.extrinsics)[:3, :3]) for c in cameras]
    )
    qvecs = unwrap_quaternions(qvecs)
    for dim in range(3):
        translates[:, dim] = savgol_filter(translates[:, dim], window, polyorder)
    for dim in range(4):
        qvecs[:, dim] = savgol_filter(qvecs[:, dim], window, polyorder)

    out = []
    for cam, t, q in zip(cameras, translates, qvecs):
        q = q / np.linalg.norm(q)
        new_cam = copy.deepcopy(cam)
        ext = quaternion_matrix(q)
        ext[:3, 3] = t
        new_cam.extrinsics = ext
        out.append(new_cam)
    return out
