"""Dataset utilities: COLMAP model IO, cameras.json interop, scene normalization.

Port of gaustudio/datasets/utils.py (COLMAP bin/txt readers :182-379,
camera_to_JSON/JSON_to_camera :26-80, getNerfppNorm :82-104, qvec
conversions :153-176) — re-written with vectorized numpy binary parsing
where the formats allow.
"""

from __future__ import annotations

import collections
import math
import struct
from typing import Dict

import numpy as np

from gaustudio_tpu.cameras import Camera, focal2fov, fov2focal, getWorld2View2
from gaustudio_tpu.utils.ply import store_ply as storePly  # noqa: F401  (API parity)

CameraModel = collections.namedtuple("CameraModel", ["model_id", "model_name", "num_params"])
ColmapCamera = collections.namedtuple("ColmapCamera", ["id", "model", "width", "height", "params"])
ColmapImage = collections.namedtuple(
    "ColmapImage", ["id", "qvec", "tvec", "camera_id", "name", "xys", "point3D_ids"]
)
Point3D = collections.namedtuple(
    "Point3D", ["id", "xyz", "rgb", "error", "image_ids", "point2D_idxs"]
)

CAMERA_MODELS = [
    CameraModel(0, "SIMPLE_PINHOLE", 3),
    CameraModel(1, "PINHOLE", 4),
    CameraModel(2, "SIMPLE_RADIAL", 4),
    CameraModel(3, "RADIAL", 5),
    CameraModel(4, "OPENCV", 8),
    CameraModel(5, "OPENCV_FISHEYE", 8),
    CameraModel(6, "FULL_OPENCV", 12),
    CameraModel(7, "FOV", 5),
    CameraModel(8, "SIMPLE_RADIAL_FISHEYE", 4),
    CameraModel(9, "RADIAL_FISHEYE", 5),
    CameraModel(10, "THIN_PRISM_FISHEYE", 12),
]
CAMERA_MODEL_IDS = {m.model_id: m for m in CAMERA_MODELS}
CAMERA_MODEL_NAMES = {m.model_name: m for m in CAMERA_MODELS}


def qvec2rotmat(qvec):
    """datasets/utils.py:153-163 (COLMAP w,x,y,z convention)."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(R):
    """datasets/utils.py:165-176 (eigenvector method)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = np.asarray(R).flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


# -- COLMAP binary/text model files ------------------------------------------

def _read_bytes(fid, nbytes, fmt, endian="<"):
    return struct.unpack(endian + fmt, fid.read(nbytes))


def read_intrinsics_binary(path) -> Dict[int, ColmapCamera]:
    """cameras.bin reader (datasets/utils.py:322-349)."""
    cameras = {}
    with open(path, "rb") as fid:
        (num_cameras,) = _read_bytes(fid, 8, "Q")
        for _ in range(num_cameras):
            cid, model_id, width, height = _read_bytes(fid, 24, "iiQQ")
            model = CAMERA_MODEL_IDS[model_id]
            params = np.array(
                _read_bytes(fid, 8 * model.num_params, "d" * model.num_params)
            )
            cameras[cid] = ColmapCamera(cid, model.model_name, width, height, params)
    return cameras


def write_intrinsics_binary(cameras: Dict[int, ColmapCamera], path) -> None:
    with open(path, "wb") as fid:
        fid.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            model = CAMERA_MODEL_NAMES[cam.model]
            fid.write(struct.pack("<iiQQ", cam.id, model.model_id, cam.width, cam.height))
            fid.write(struct.pack("<" + "d" * len(cam.params), *cam.params))


def read_extrinsics_binary(path) -> Dict[int, ColmapImage]:
    """images.bin reader (datasets/utils.py:289-320).

    Uses the native C++ parser (gaustudio_tpu.utils.native) when built —
    the python struct loop is the reference's slowest loader path."""
    from gaustudio_tpu.utils import native

    try:
        raw = native.read_images_binary(path)
    except IOError:
        raw = None
    if raw is not None:
        return {
            iid: ColmapImage(iid, q, t, cid, name, xys, pids)
            for iid, (q, t, cid, name, xys, pids) in raw.items()
        }
    images = {}
    with open(path, "rb") as fid:
        (num_images,) = _read_bytes(fid, 8, "Q")
        for _ in range(num_images):
            props = _read_bytes(fid, 64, "idddddddi")
            image_id = props[0]
            qvec = np.array(props[1:5])
            tvec = np.array(props[5:8])
            camera_id = props[8]
            name_chars = []
            while True:
                c = fid.read(1)
                if c == b"\x00":
                    break
                name_chars.append(c)
            name = b"".join(name_chars).decode("utf-8")
            (n2d,) = _read_bytes(fid, 8, "Q")
            raw = np.frombuffer(
                fid.read(24 * n2d),
                dtype=[("x", "<f8"), ("y", "<f8"), ("id", "<i8")],
            )
            xys = np.stack([raw["x"], raw["y"]], axis=1) if n2d else np.zeros((0, 2))
            ids = raw["id"].copy()
            images[image_id] = ColmapImage(image_id, qvec, tvec, camera_id, name, xys, ids)
    return images


def write_extrinsics_binary(images: Dict[int, ColmapImage], path) -> None:
    with open(path, "wb") as fid:
        fid.write(struct.pack("<Q", len(images)))
        for im in images.values():
            fid.write(struct.pack("<idddddddi", im.id, *im.qvec, *im.tvec, im.camera_id))
            fid.write(im.name.encode("utf-8") + b"\x00")
            n = len(im.xys)
            fid.write(struct.pack("<Q", n))
            buf = np.empty((n, 3), "<f8")
            buf[:, :2] = im.xys
            buf[:, 2] = np.asarray(im.point3D_ids, "<i8").view("<f8")
            fid.write(buf.tobytes())


def read_intrinsics_text(path) -> Dict[int, ColmapCamera]:
    """cameras.txt reader (datasets/utils.py:266-287)."""
    cameras = {}
    with open(path) as fid:
        for line in fid:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            elems = line.split()
            cid = int(elems[0])
            cameras[cid] = ColmapCamera(
                cid, elems[1], int(elems[2]), int(elems[3]),
                np.array(list(map(float, elems[4:]))),
            )
    return cameras


def read_extrinsics_text(path) -> Dict[int, ColmapImage]:
    """images.txt reader (datasets/utils.py:352-379)."""
    images = {}
    with open(path) as fid:
        lines = [ln.strip() for ln in fid]
    # pair each image header with its (possibly empty) 2D-points line
    content = []
    pending_header = None
    for ln in lines:
        if ln.startswith("#"):
            continue
        if pending_header is None:
            if not ln:
                continue
            pending_header = ln
        else:
            content.extend([pending_header, ln])
            pending_header = None
    if pending_header is not None:
        content.extend([pending_header, ""])
    for i in range(0, len(content), 2):
        elems = content[i].split()
        image_id = int(elems[0])
        qvec = np.array(list(map(float, elems[1:5])))
        tvec = np.array(list(map(float, elems[5:8])))
        camera_id = int(elems[8])
        name = elems[9]
        pts = content[i + 1].split() if i + 1 < len(content) else []
        xys = np.array(
            [[float(pts[j]), float(pts[j + 1])] for j in range(0, len(pts), 3)]
        ).reshape(-1, 2)
        ids = np.array([int(pts[j + 2]) for j in range(0, len(pts), 3)], np.int64)
        images[image_id] = ColmapImage(image_id, qvec, tvec, camera_id, name, xys, ids)
    return images


def read_points3D_binary(path):
    """points3D.bin reader (datasets/utils.py:235-264): (xyz, rgb, error).

    Uses the native C++ parser when available."""
    from gaustudio_tpu.utils import native

    try:
        result = native.read_points3d_binary(path)
    except IOError:
        result = None
    if result is not None:
        return result
    xyzs, rgbs, errors = [], [], []
    with open(path, "rb") as fid:
        (num_points,) = _read_bytes(fid, 8, "Q")
        for _ in range(num_points):
            props = _read_bytes(fid, 43, "QdddBBBd")
            xyzs.append(props[1:4])
            rgbs.append(props[4:7])
            errors.append(props[7])
            (track_len,) = _read_bytes(fid, 8, "Q")
            fid.seek(8 * track_len, 1)
    return (
        np.array(xyzs).reshape(-1, 3),
        np.array(rgbs).reshape(-1, 3),
        np.array(errors).reshape(-1, 1),
    )


def write_points3D_binary(xyz, rgb, path, errors=None) -> None:
    xyz = np.asarray(xyz, np.float64)
    rgb = np.asarray(rgb)
    if errors is None:
        errors = np.zeros(len(xyz))
    with open(path, "wb") as fid:
        fid.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            fid.write(
                struct.pack(
                    "<QdddBBBd", i + 1, *xyz[i], int(rgb[i][0]), int(rgb[i][1]),
                    int(rgb[i][2]), float(errors[i]),
                )
            )
            fid.write(struct.pack("<Q", 0))


def read_points3D_text(path):
    """points3D.txt reader (datasets/utils.py:194-233)."""
    xyzs, rgbs, errors = [], [], []
    with open(path) as fid:
        for line in fid:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            elems = line.split()
            xyzs.append(list(map(float, elems[1:4])))
            rgbs.append(list(map(int, elems[4:7])))
            errors.append(float(elems[7]))
    return (
        np.array(xyzs).reshape(-1, 3),
        np.array(rgbs).reshape(-1, 3),
        np.array(errors).reshape(-1, 1),
    )


# -- cameras.json (3DGS output format) interop --------------------------------

def JSON_to_camera(camera_json, data_device=None) -> Camera:
    """datasets/utils.py:26-57."""
    del data_device
    width = camera_json["width"]
    height = camera_json["height"]
    position = np.array(camera_json["position"])
    rotation = np.array(camera_json["rotation"])
    W2C = np.eye(4)
    W2C[:3, :3] = rotation
    W2C[:3, 3] = position
    Rt = np.linalg.inv(W2C)
    R = Rt[:3, :3].transpose()
    T = Rt[:3, 3]
    kwargs = {}
    if "cx" in camera_json and "cy" in camera_json:
        kwargs["principal_point_ndc"] = (
            camera_json["cx"] / width,
            camera_json["cy"] / height,
        )
    return Camera(
        image_name=camera_json["img_name"],
        image_width=width,
        image_height=height,
        R=R,
        T=T,
        FoVx=focal2fov(camera_json["fx"], width),
        FoVy=focal2fov(camera_json["fy"], height),
        **kwargs,
    )


def camera_to_JSON(id, camera: Camera) -> dict:
    """datasets/utils.py:59-80."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(camera.R).transpose()
    Rt[:3, 3] = camera.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": id,
        "img_name": camera.image_name,
        "width": int(camera.image_width),
        "height": int(camera.image_height),
        "position": pos.tolist(),
        "rotation": [x.tolist() for x in rot],
        "fy": fov2focal(camera.FoVy, camera.image_height),
        "fx": fov2focal(camera.FoVx, camera.image_width),
        "cy": camera.image_height * camera.principal_point_ndc[1],
        "cx": camera.image_width * camera.principal_point_ndc[0],
    }


def getNerfppNorm(cam_info):
    """datasets/utils.py:82-104: scene center + 1.1x max camera-center spread."""
    centers = []
    for cam in cam_info:
        W2C = getWorld2View2(cam.R, cam.T)
        C2W = np.linalg.inv(W2C)
        centers.append(C2W[:3, 3:4])
    centers = np.hstack(centers)
    center = np.mean(centers, axis=1, keepdims=True)
    dist = np.linalg.norm(centers - center, axis=0)
    return {
        "translate": -center.flatten(),
        "radius": float(np.max(dist) * 1.1),
        "min_radius": float(np.min(dist) * 1.5),
    }
