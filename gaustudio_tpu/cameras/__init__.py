"""Camera model — a JAX-pytree port of the reference Camera dataclass
(gaustudio/datasets/__init__.py:45-394).

Matrix conventions are identical to the reference: ``world_view_transform``
and ``full_proj_transform`` are *transposed* (row-vector) matrices built by
getWorld2View2 / getProjectionMatrix (datasets/__init__.py:52-104), with an
OpenGL-style z in [0,1] projection and principal-point shift support.

The object is registered as a pytree: array fields (matrices, image, mask,
depth, normal) are leaves, so a Camera — or a stacked batch of cameras —
can cross jit/shard_map boundaries directly; metadata (W/H, paths) is static.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def getWorld2View(R, t):
    """datasets/__init__.py:45-50."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(R).transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return np.float32(Rt)


def getWorld2View2(R, t, translate=np.array([0.0, 0.0, 0.0]), scale=1.0):
    """datasets/__init__.py:52-63: W2V with recentered/rescaled camera center."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(R).transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def getProjectionMatrix(znear, zfar, fovX, fovY, width=None, height=None,
                        principal_point_ndc=None):
    """datasets/__init__.py:66-104: OpenGL projection with z in [0,1] and
    optional principal-point shift."""
    tanHalfFovY = math.tan(fovY / 2)
    tanHalfFovX = math.tan(fovX / 2)
    top = tanHalfFovY * znear
    bottom = -top
    right = tanHalfFovX * znear
    left = -right

    if principal_point_ndc is not None and width is not None:
        cx = width * principal_point_ndc[0]
        cy = height * principal_point_ndc[1]
        focal_x = width / (2.0 * tanHalfFovX)
        focal_y = height / (2.0 * tanHalfFovY)
        offset_x = (cx - width / 2) / focal_x * znear
        offset_y = (cy - height / 2) / focal_y * znear
        top += offset_y
        bottom += offset_y
        left += offset_x
        right += offset_x

    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def focal2fov(focal, pixels):
    """datasets/utils.py:106-107."""
    return 2 * math.atan(pixels / (2 * focal))


def fov2focal(fov, pixels):
    """datasets/utils.py:109-110."""
    return pixels / (2 * math.tan(fov / 2))


_ARRAY_FIELDS = (
    "R", "T", "world_view_transform", "projection_matrix",
    "full_proj_transform", "camera_center", "image", "bg_image", "mask",
    "normal", "depth",
)
_STATIC_FIELDS = (
    "FoVx", "FoVy", "image_width", "image_height", "znear", "zfar",
    "trans", "scale", "principal_point_ndc", "image_path", "image_name",
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Camera:
    """Port of the reference Camera (gaustudio/datasets/__init__.py:114-394)."""

    R: np.ndarray = None
    T: np.ndarray = None
    FoVx: float = None
    FoVy: float = None
    image_width: int = None
    image_height: int = None
    znear: float = 0.1
    zfar: float = 100.0
    trans: tuple = (0.0, 0.0, 0.0)
    scale: float = 1.0
    world_view_transform: np.ndarray = None
    full_proj_transform: np.ndarray = None
    projection_matrix: np.ndarray = None
    camera_center: np.ndarray = None
    principal_point_ndc: tuple = (0.5, 0.5)
    image_path: Optional[str] = None
    image_name: Optional[str] = None
    image: Optional[np.ndarray] = None
    bg_image: Optional[np.ndarray] = None
    mask: Optional[np.ndarray] = None
    normal: Optional[np.ndarray] = None
    depth: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.R is not None and self.world_view_transform is None:
            self._setup()

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in _ARRAY_FIELDS)
        aux = tuple(getattr(self, f) for f in _STATIC_FIELDS)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for f, v in zip(_ARRAY_FIELDS, children):
            object.__setattr__(obj, f, v)
        for f, v in zip(_STATIC_FIELDS, aux):
            object.__setattr__(obj, f, v)
        return obj

    # -- setup ---------------------------------------------------------------
    def _setup(self):
        """datasets/__init__.py:148-183."""
        self.trans = tuple(np.asarray(self.trans).tolist()) if self.trans is not None else (0.0, 0.0, 0.0)
        if self.principal_point_ndc is None:
            self.principal_point_ndc = (0.5, 0.5)
        self.principal_point_ndc = tuple(np.asarray(self.principal_point_ndc).tolist())

        self.world_view_transform = getWorld2View2(
            self.R, self.T, np.asarray(self.trans), self.scale
        ).T.astype(np.float32)

        if self.image_path is not None and self.image is None:
            self.load_image(self.image_path)

        self.projection_matrix = getProjectionMatrix(
            znear=self.znear, zfar=self.zfar, fovX=self.FoVx, fovY=self.FoVy,
            width=self.image_width, height=self.image_height,
            principal_point_ndc=self.principal_point_ndc,
        ).T.astype(np.float32)
        self.full_proj_transform = (
            self.world_view_transform @ self.projection_matrix
        ).astype(np.float32)
        view_inv = np.linalg.inv(self.world_view_transform)
        self.camera_center = view_inv[3][:3].astype(np.float32)

    def load_image(self, image_path, bg_color=None):
        """datasets/__init__.py:185-192 (+HEIC path of :161-179).

        RGBA images are alpha-composited over ``bg_color`` (default black;
        the nerf_synthetic white-background convention passes ones).
        """
        from PIL import Image, ImageOps

        if str(image_path).lower().endswith((".heic", ".heif")):
            try:
                from pillow_heif import register_heif_opener  # pragma: no cover

                register_heif_opener()
            except ImportError:
                pass
        with Image.open(image_path) as pil_img:
            pil_img = ImageOps.exif_transpose(pil_img)
            if pil_img.mode == "RGBA":
                arr = np.asarray(pil_img, np.float32) / 255.0
                bg = np.zeros(3, np.float32) if bg_color is None else np.asarray(
                    bg_color, np.float32)
                a = arr[..., 3:4]
                self.image = arr[..., :3] * a + bg * (1.0 - a)
                self.mask = a[..., 0]
            else:
                pil_img = pil_img.convert("RGB")
                self.image = np.asarray(pil_img, np.float32) / 255.0
        self.image_path = image_path
        self.image_name = os.path.basename(str(image_path)).split(".")[0]
        self.image_height, self.image_width = self.image.shape[:2]

    def __repr__(self):
        return (
            f"Camera(FoVx={self.FoVx:.2f}, FoVy={self.FoVy:.2f}, "
            f"image_width={self.image_width}, image_height={self.image_height}, "
            f"znear={self.znear}, zfar={self.zfar})"
        )

    # -- intrinsics / extrinsics ----------------------------------------------
    @property
    def fx(self):
        return self.intrinsics[0, 0]

    @property
    def fy(self):
        return self.intrinsics[1, 1]

    @property
    def tanfovx(self):
        return math.tan(self.FoVx * 0.5)

    @property
    def tanfovy(self):
        return math.tan(self.FoVy * 0.5)

    @property
    def extrinsics(self):
        """W2V (4x4, math convention) — datasets/__init__.py:225-227."""
        return np.asarray(self.world_view_transform).T

    @extrinsics.setter
    def extrinsics(self, extrinsics):
        """datasets/__init__.py:239-244."""
        extrinsics = np.asarray(extrinsics)
        self.R = np.transpose(extrinsics[:3, :3])
        self.T = extrinsics[:3, 3]
        self._setup()

    @property
    def intrinsics(self):
        """datasets/__init__.py:229-237."""
        focal_x = fov2focal(self.FoVx, self.image_width)
        focal_y = fov2focal(self.FoVy, self.image_height)
        return np.array(
            [
                [focal_x, 0, self.image_width * self.principal_point_ndc[0]],
                [0, focal_y, self.image_height * self.principal_point_ndc[1]],
                [0, 0, 1],
            ],
            np.float32,
        )

    def update_intrinsics(self, intrinsics, image_width, image_height):
        """datasets/__init__.py:207-215."""
        fx = intrinsics[0, 0]
        fy = intrinsics[1, 1]
        self.FoVx = 2.0 * np.arctan(image_width / (2.0 * fx))
        self.FoVy = 2.0 * np.arctan(image_height / (2.0 * fy))
        self.image_width = int(image_width)
        self.image_height = int(image_height)
        self._setup()

    # -- resampling -----------------------------------------------------------
    def downsample_scale(self, scale):
        """datasets/__init__.py:246-249."""
        resolution = round(self.image_width / scale), round(self.image_height / scale)
        return self.downsample(resolution)

    def downsample(self, resolution):
        """datasets/__init__.py:251-266 (PIL bilinear for color, nearest for
        depth, matching the reference's resize kernels)."""
        from PIL import Image

        w, h = resolution

        def resize_color(img):
            arr = np.asarray(img)
            if arr.max() <= 1.0:
                arr = arr * 255.0
            pil = Image.fromarray(arr.astype(np.uint8))
            out = np.asarray(pil.resize((w, h)), np.float32) / 255.0
            return np.clip(out, 0.0, 1.0)

        if self.image is not None:
            self.image = resize_color(self.image)[..., :3]
        if self.bg_image is not None:
            self.bg_image = resize_color(self.bg_image)[..., :3]
        if self.mask is not None:
            self.mask = resize_color(self.mask)
        if self.normal is not None:
            self.normal = resize_color(self.normal)
        if self.depth is not None:
            pil = Image.fromarray(np.asarray(self.depth, np.float32))
            self.depth = np.asarray(pil.resize((w, h), Image.NEAREST), np.float32)
        self.image_width, self.image_height = w, h
        self._setup()
        return self

    def to(self, device=None):
        """API-parity no-op (JAX manages placement); returns self."""
        return self

    # -- geometry -------------------------------------------------------------
    def insideView(self, world_xyz, mask=None):
        """datasets/__init__.py:268-305: mask-aware frustum containment."""
        world_xyz = jnp.asarray(world_xyz)
        if mask is None:
            mask = jnp.ones((self.image_height, self.image_width))
        mask = jnp.asarray(mask)
        if mask.ndim == 3:
            mask = mask[..., 0]
        homo = jnp.concatenate([world_xyz, jnp.ones_like(world_xyz[:, :1])], -1)
        clip = homo @ jnp.asarray(self.full_proj_transform)
        ndc = clip[:, :3] / clip[:, 3:4]
        px = (ndc[:, 0] + 1) * 0.5 * self.image_width
        py = (1 + ndc[:, 1]) * 0.5 * self.image_height
        in_front = clip[:, 2] > 0
        inside = (
            (ndc[:, 0] >= -1) & (ndc[:, 0] <= 1) & (ndc[:, 1] >= -1) & (ndc[:, 1] <= 1)
        )
        valid = in_front & inside
        ix = jnp.clip(px.astype(jnp.int32), 0, self.image_width - 1)
        iy = jnp.clip(py.astype(jnp.int32), 0, self.image_height - 1)
        return valid & (mask[iy, ix] > 0.5)

    def depth2point(self, depth=None, coordinate="camera"):
        """datasets/__init__.py:307-339: NDC grid -> camera/world unprojection.

        The reference's (slightly unusual) convention is kept: pixel (i, j)
        maps to normalized coords (j/(W-1), i/(H-1)) scaled by (W-1, H-1)
        and depth, through the inverse intrinsics (ndc_2_cam, :106-112).
        """
        if depth is None:
            depth = self.depth
        if depth is None:
            raise ValueError("Depth is not available.")
        depth = jnp.asarray(depth)
        h, w = depth.shape
        vx = jnp.arange(w, dtype=jnp.float32) / (w - 1)
        vy = jnp.arange(h, dtype=jnp.float32) / (h - 1)
        gy, gx = jnp.meshgrid(vy, vx, indexing="ij")
        ndc_xyz = jnp.stack([gx, gy, depth], axis=-1)
        if coordinate == "ndc":
            return ndc_xyz
        inv_scale = jnp.asarray([w - 1, h - 1], jnp.float32)
        cam_z = ndc_xyz[..., 2:3]
        cam_xy = ndc_xyz[..., :2] * inv_scale * cam_z
        cam_xyz = jnp.concatenate([cam_xy, cam_z], axis=-1)
        K = jnp.asarray(self.intrinsics) if isinstance(self.intrinsics, np.ndarray) else self.intrinsics
        cam_xyz = cam_xyz @ jnp.linalg.inv(K.T)
        if coordinate == "camera":
            return cam_xyz
        if coordinate == "world":
            ext = jnp.asarray(self.extrinsics)
            c2w = jnp.linalg.inv(ext)
            pts = cam_xyz.reshape(-1, 3)
            world = (
                jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], -1) @ c2w.T
            )[:, :3]
            return world.reshape(h, w, 3)
        raise ValueError("Invalid coordinate system.")

    def depth2normal(self, depth=None, k: int = 3, d_min: float = 1e-3,
                     d_max: float = 100000.0, coordinate="camera"):
        """datasets/__init__.py:341-380: cross-product-of-gradients normals
        with a 5-point validity mask; invalid pixels get -1."""
        if depth is None:
            depth = self.depth
        if depth is None:
            raise ValueError("Depth is not available.")
        depth = jnp.asarray(depth)
        pts = self.depth2point(depth, coordinate="camera")  # (H, W, 3)
        h, w, _ = pts.shape
        kk = (k - 1) // 2
        pad = jnp.pad(pts, ((kk, kk), (kk, kk), (0, 0)))
        valid_pad = (pad[..., 2] > d_min) & (pad[..., 2] < d_max)

        vec_vert = pad[:h, kk:kk + w] - pad[2 * kk:2 * kk + h, kk:kk + w]
        vec_hori = pad[kk:kk + h, :w] - pad[kk:kk + h, 2 * kk:2 * kk + w]
        valid = (
            valid_pad[kk:kk + h, kk:kk + w]
            & valid_pad[:h, kk:kk + w]
            & valid_pad[2 * kk:2 * kk + h, kk:kk + w]
            & valid_pad[kk:kk + h, :w]
            & valid_pad[kk:kk + h, 2 * kk:2 * kk + w]
        )
        cross = -jnp.cross(vec_vert, vec_hori)
        normal = cross / jnp.maximum(
            jnp.linalg.norm(cross, axis=-1, keepdims=True), 1e-12
        )
        if coordinate == "world":
            Rwc_inv = jnp.linalg.inv(jnp.asarray(self.extrinsics)[:3, :3])
            normal = normal @ Rwc_inv.T
        normal = jnp.where(valid[..., None], normal, -1.0)
        return normal

    def normal2worldnormal(self, normal=None):
        """datasets/__init__.py:382-388."""
        if normal is None:
            normal = self.normal
        if normal is None:
            raise ValueError("Normal is not available.")
        Rwc_inv = jnp.linalg.inv(jnp.asarray(self.extrinsics)[:3, :3])
        return jnp.asarray(normal) @ Rwc_inv.T

    def worldnormal2normal(self, normal):
        """datasets/__init__.py:390-394."""
        if normal is None:
            raise ValueError("Normal is not available.")
        return jnp.asarray(normal) @ jnp.asarray(self.extrinsics)[:3, :3].T
