"""TSDF fusion + marching tetrahedra tests on analytic scenes."""

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.ops import mcubes, tsdf
from gaustudio_tpu.utils import mesh as meshu
from gaustudio_tpu.cameras import Camera


def _sphere_sdf(n=48, r=0.35):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r, lin[1] - lin[0]


def test_marching_tetrahedra_sphere():
    sdf, h = _sphere_sdf()
    verts, faces = mcubes.marching_tetrahedra(
        sdf, iso=0.0, origin=np.array([-1.0, -1.0, -1.0]), voxel_size=h
    )
    assert len(verts) > 500 and len(faces) > 1000
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.35, atol=0.01)
    assert radii.std() < 0.01
    # faces reference valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # outward orientation: normal dot position > 0 for most faces
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    c = verts[faces].mean(1)
    frac_out = ((n * c).sum(-1) > 0).mean()
    assert frac_out > 0.99
    # surface area close to analytic 4*pi*r^2
    area = 0.5 * np.linalg.norm(n, axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.35**2, rtol=0.05)


def test_marching_tetrahedra_weight_mask():
    sdf, h = _sphere_sdf(32)
    w = np.ones_like(sdf)
    w[:16] = 0.0  # mask out half the grid
    verts, faces = mcubes.marching_tetrahedra(
        sdf, 0.0, weight=w, min_weight=0.5,
        origin=np.array([-1.0, -1.0, -1.0]), voxel_size=h,
    )
    assert len(verts) > 0
    assert (verts[:, 0] > -h * 17).all()  # nothing from the masked half


def _sphere_depth(cam: Camera, center, radius):
    """Analytic depth map of a sphere (z-depth convention)."""
    H, W = cam.image_height, cam.image_width
    K = cam.intrinsics
    i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs = np.stack(
        [(j - K[0, 2]) / K[0, 0], (i - K[1, 2]) / K[1, 1], np.ones_like(j, np.float32)],
        -1,
    )
    # ray in world space
    ext = cam.extrinsics
    Rcw = np.linalg.inv(ext[:3, :3])
    origin = -Rcw @ ext[:3, 3]
    d_world = dirs @ Rcw.T
    oc = origin - center
    b = (d_world * oc).sum(-1)
    a = (d_world * d_world).sum(-1)
    c = (oc * oc).sum() - radius * radius
    disc = b * b - a * c
    tray = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / a, 0.0)
    depth = np.where(disc > 0, tray, 0.0)  # multiply by dir z=1 in cam frame
    return depth.astype(np.float32)


def test_tsdf_sphere_fusion():
    center = np.zeros(3)
    radius = 0.4
    vol = tsdf.volume_from_bounds(
        [-0.7, -0.7, -0.7], [0.7, 0.7, 0.7], voxel_size=0.025, sdf_trunc=0.1
    )
    cams = []
    for k in range(8):
        ang = 2 * np.pi * k / 8
        # camera at distance 2 looking at origin
        fwd = -np.array([np.cos(ang), np.sin(ang), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, fwd)
        Rwc = np.stack([right, -up, fwd], 1)  # world->? build W2V
        W2V = np.eye(4)
        W2V[:3, :3] = Rwc.T
        W2V[:3, 3] = -Rwc.T @ (-fwd * 2.0)
        cam = Camera(R=Rwc, T=W2V[:3, 3], FoVx=0.8, FoVy=0.8,
                     image_width=80, image_height=80)
        cams.append(cam)

    for cam in cams:
        depth = _sphere_depth(cam, center, radius)
        assert (depth > 0).sum() > 100
        vol = tsdf.integrate(
            vol, jnp.asarray(depth), jnp.asarray(cam.intrinsics),
            jnp.asarray(cam.extrinsics),
        )

    verts, faces = mcubes.marching_tetrahedra(
        np.asarray(vol.tsdf), 0.0, weight=np.asarray(vol.weight), min_weight=2.0,
        origin=np.asarray(vol.origin), voxel_size=float(vol.voxel_size),
    )
    assert len(verts) > 200
    radii = np.linalg.norm(verts - center, axis=1)
    np.testing.assert_allclose(np.median(radii), radius, atol=0.03)


def test_mesh_io_and_cleanup(tmp_path):
    sdf, h = _sphere_sdf(24)
    verts, faces = mcubes.marching_tetrahedra(
        sdf, 0.0, origin=np.array([-1.0, -1.0, -1.0]), voxel_size=h
    )
    # add a tiny floating component
    extra_v = np.array([[2, 2, 2], [2.1, 2, 2], [2, 2.1, 2]], np.float32)
    verts2 = np.concatenate([verts, extra_v])
    faces2 = np.concatenate([faces, [[len(verts), len(verts) + 1, len(verts) + 2]]])

    cv, cf = meshu.clean_mesh_components(verts2, faces2, ratio_threshold=0.5)
    assert len(cf) == len(faces)
    assert (np.linalg.norm(cv, axis=1) < 1.0).all()

    p = str(tmp_path / "m.ply")
    meshu.save_mesh(p, cv, cf)
    lv, lf = meshu.load_mesh(p)
    np.testing.assert_allclose(lv, cv, rtol=1e-6)
    np.testing.assert_array_equal(lf, cf)
