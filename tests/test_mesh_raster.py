"""JAX mesh rasterizer tests."""

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.ops import mesh_raster


def _cam(w=64, h=48):
    return Camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]), FoVx=1.0, FoVy=1.0,
                  image_width=w, image_height=h)


def test_single_triangle():
    cam = _cam()
    verts = jnp.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]],
                        jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    frag = mesh_raster.rasterize_mesh(
        verts, faces, jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform), 64, 48,
        num_entries=4096, chunk=256,
    )
    mask = np.asarray(frag.mask)
    assert mask.sum() > 50
    # depth == 3 on the triangle (plane z=0, camera at -3)
    d = np.asarray(frag.depth)
    np.testing.assert_allclose(d[mask], 3.0, atol=1e-3)
    # center covered
    assert mask[20, 32]
    assert np.asarray(frag.tri_id)[20, 32] == 0
    bary = np.asarray(frag.bary)[mask]
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-4)
    assert (bary > -1e-4).all()


def test_occlusion_order():
    cam = _cam()
    # near triangle (z=0) occludes far one (z=1) in the overlap
    verts = jnp.asarray(
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0],
         [-0.7, -0.7, 1.0], [0.7, -0.7, 1.0], [0.0, 0.8, 1.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    frag = mesh_raster.rasterize_mesh(
        verts, faces, jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform), 64, 48,
        num_entries=4096, chunk=256,
    )
    tid = np.asarray(frag.tri_id)
    assert tid[20, 32] == 0  # near wins
    assert (tid == 1).sum() > 10  # far visible outside the overlap
    d = np.asarray(frag.depth)
    np.testing.assert_allclose(d[tid == 0], 3.0, atol=1e-3)
    np.testing.assert_allclose(d[tid == 1], 4.0, atol=2e-3)


def test_attribute_interpolation_and_normals():
    cam = _cam()
    verts = jnp.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]],
                        jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32)
    frag = mesh_raster.rasterize_mesh(
        verts, faces, jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform), 64, 48,
        num_entries=4096, chunk=256,
    )
    img = np.asarray(mesh_raster.interpolate_attribute(frag, faces, colors))
    mask = np.asarray(frag.mask)
    np.testing.assert_allclose(img[mask].sum(-1), 1.0, atol=1e-4)
    # bottom of the image = world +y = vertex 2 (blue); top = red/green mix
    ys, xs = np.where(mask)
    bottom = img[ys.max(), xs[ys == ys.max()].min()]
    assert bottom[2] > 0.5
    top_row = ys.min()
    top = img[top_row, xs[ys == top_row]]
    assert (top[:, 0] + top[:, 1]).mean() > 0.8

    n = np.asarray(mesh_raster.face_normals(verts, faces))
    np.testing.assert_allclose(np.abs(n[0]), [0, 0, 1], atol=1e-6)
