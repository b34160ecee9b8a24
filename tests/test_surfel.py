"""2DGS surfel rasterizer tests: analytic plane scene + renderer contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaustudio_tpu import models, renderers
from gaustudio_tpu.cameras import Camera
from gaustudio_tpu.ops import rasterize_surfel
from gaustudio_tpu.ops.rasterize import RasterizeSettings


def _front_camera(w=64, h=48, fov=1.0):
    return Camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]), FoVx=fov, FoVy=fov,
                  image_width=w, image_height=h)


def _settings(cam, n_entries=1 << 13):
    import math

    return RasterizeSettings(
        image_height=cam.image_height, image_width=cam.image_width,
        tanfovx=math.tan(cam.FoVx / 2), tanfovy=math.tan(cam.FoVy / 2),
        bg=jnp.zeros(3),
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        num_entries=n_entries, chunk=256, backend="xla",
    )


def test_surfel_flat_disk():
    """One big camera-facing surfel at the origin: center pixels opaque,
    depth == 3, normal == -z (towards camera)."""
    cam = _front_camera()
    st = _settings(cam)
    xyz = jnp.asarray([[0.0, 0.0, 0.0]])
    opac = jnp.asarray([0.95])
    scales = jnp.asarray([[0.8, 0.8]])
    rots = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])  # identity: normal = +z world
    colors = jnp.asarray([[0.2, 0.9, 0.4]])

    out = rasterize_surfel.rasterize_surfels(
        xyz, opac, st, scales=scales, rotations=rots, colors_precomp=colors
    )
    alpha = np.asarray(out["rendered_alpha"][0])
    h, w = alpha.shape
    assert alpha[h // 2, w // 2] > 0.9
    depth_sum = np.asarray(out["rendered_depth_sum"][0])
    d_center = depth_sum[h // 2, w // 2] / alpha[h // 2, w // 2]
    np.testing.assert_allclose(d_center, 3.0, atol=0.02)
    # view normal: +z in view space (pointing away), magnitude ~ alpha
    nrm = np.asarray(out["rendered_normal_view"])[:, h // 2, w // 2]
    np.testing.assert_allclose(abs(nrm[2]), alpha[h // 2, w // 2], atol=0.02)
    rgb = np.asarray(out["render"])[:, h // 2, w // 2]
    np.testing.assert_allclose(rgb, alpha[h // 2, w // 2] * np.array([0.2, 0.9, 0.4]),
                               atol=0.02)


def test_surfel_tilted_depth_gradient():
    """A tilted surfel produces a depth ramp across the image."""
    cam = _front_camera()
    st = _settings(cam)
    # rotate around y by 45 deg: quat (cos22.5, 0, sin22.5, 0)
    a = np.deg2rad(45) / 2
    rots = jnp.asarray([[np.cos(a), 0.0, np.sin(a), 0.0]], jnp.float32)
    out = rasterize_surfel.rasterize_surfels(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([0.99]), st,
        scales=jnp.asarray([[1.5, 1.5]]), rotations=rots,
        colors_precomp=jnp.asarray([[1.0, 1.0, 1.0]]),
    )
    alpha = np.asarray(out["rendered_alpha"][0])
    depth = np.asarray(out["rendered_depth_sum"][0]) / np.maximum(alpha, 1e-9)
    h, w = alpha.shape
    row = depth[h // 2]
    mask = alpha[h // 2] > 0.5
    xs = np.where(mask)[0]
    assert len(xs) > 10
    # depth increases monotonically along x for a y-rotated plane
    d = row[xs]
    assert (np.diff(d) > 0).mean() > 0.95 or (np.diff(d) < 0).mean() > 0.95


@pytest.mark.slow
def test_surfel_gradients_flow():
    cam = _front_camera(w=32, h=32)
    st = _settings(cam, n_entries=1 << 12)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32) * 0.3)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, 20).astype(np.float32))
    scales = jnp.asarray((np.abs(rng.normal(size=(20, 2))) * 0.1 + 0.05).astype(np.float32))
    rots = rng.normal(size=(20, 4)).astype(np.float32)
    rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
    colors = jnp.asarray(rng.uniform(size=(20, 3)).astype(np.float32))

    def loss(xyz, opac, scales, rots, colors):
        out = rasterize_surfel.rasterize_surfels(
            xyz, opac, st, scales=scales, rotations=rots, colors_precomp=colors
        )
        return (jnp.sum(out["render"]) + jnp.sum(out["rendered_alpha"]) +
                jnp.sum(out["rendered_normal_view"]))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xyz, opac, scales, rots, colors)
    for gname, gr in zip("xyz opac scales rots colors".split(), grads):
        arr = np.asarray(gr)
        assert np.isfinite(arr).all(), gname
        assert np.abs(arr).sum() > 0, gname


def test_surfel_renderer_registry():
    rng = np.random.default_rng(1)
    pcd = models.make({
        "name": "vanilla_pcd",
        "attributes": {"xyz": 3, "opacity": 1, "f_dc": 3, "f_rest": 45,
                        "scale": 2, "rot": 4},
    })
    n = 50
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    pcd.create_from_attribute(
        xyz=xyz, rgb=rng.uniform(size=(n, 3)).astype(np.float32),
        scale=np.full((n, 2), -2.0, np.float32),
    )
    pcd.active_sh_degree = 0
    cam = _front_camera()
    r = renderers.make({"name": "surfel_renderer"})
    out = r.render(cam, pcd)
    assert out["render"].shape == (3, 48, 64)
    assert out["rendered_normal"].shape == (3, 48, 64)
    assert np.isfinite(np.asarray(out["render"])).all()
    assert float(np.asarray(out["rendered_final_opacity"]).max()) > 0.1


def test_surfel_fast_binning_matches_xla_path():
    """The pallas-backend surfel path (fast binning + XLA compositor) must
    match the xla-backend path exactly (same entry order, no false culls)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    n = 80
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    xyz[:, 2] += 2.5
    scales = np.abs(rng.normal(size=(n, 3)).astype(np.float32)) * 0.15 + 0.02
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    settings = _settings(_front_camera(64, 48))

    def run(backend):
        s = settings._replace(backend=backend, num_entries=1 << 13, chunk=512)
        return rasterize_surfel.rasterize_surfels(
            jnp.asarray(xyz), jnp.asarray(opac), s,
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=jnp.asarray(colors),
        )

    ref = run("xla")
    with pltpu.force_tpu_interpret_mode():
        fast = run("pallas")
    for k in ("render", "rendered_alpha", "rendered_normal_view",
              "rendered_depth_sum", "rendered_median_depth"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_surfel_lean_mode_close_and_backward_raises():
    """need_grads=False (the renderer/inference default): output matches
    the exact pipeline within f16 payload rounding, and differentiating
    raises loudly (the slot operand was dropped)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    n = 80
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    xyz[:, 2] += 2.5
    scales = np.abs(rng.normal(size=(n, 3)).astype(np.float32)) * 0.15 + 0.02
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    settings = _settings(_front_camera(64, 48))

    def run(need_grads):
        s = settings._replace(backend="pallas", num_entries=1 << 13,
                              chunk=512, need_grads=need_grads)
        return rasterize_surfel.rasterize_surfels(
            jnp.asarray(xyz), jnp.asarray(opac), s,
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=jnp.asarray(colors),
        )

    with pltpu.force_tpu_interpret_mode():
        exact = run(True)
        lean = run(False)
    # The packed single-sort table (SURFEL_PACK) rides a 19-bit quantized
    # depth key, so near-equal-depth surfels can composite in a different
    # (equally valid) order than the exact f32 two-key sort — an isolated-
    # pixel effect, gated the same way as the vanilla inference parity
    # check (tools/tpu_parity_check.py): tight on ~all pixels, a loose cap
    # plus a per-image fraction bound on quantization flips.
    for k, tol in (("render", 4e-3), ("rendered_alpha", 4e-3),
                   ("rendered_normal_view", 4e-3),
                   ("rendered_depth_sum", 2e-2)):
        d = np.abs(np.asarray(lean[k]) - np.asarray(exact[k]))
        assert d.max() < 0.05, f"{k}: max|err|={d.max():.4f}"
        frac = float((d > tol).mean())
        assert frac < 2e-3, f"{k}: frac>|{tol}|={frac:.5f}"

    def loss(colors):
        s = settings._replace(backend="pallas", num_entries=1 << 13,
                              chunk=512, need_grads=False)
        out = rasterize_surfel.rasterize_surfels(
            jnp.asarray(xyz), jnp.asarray(opac), s,
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=colors,
        )
        return jnp.sum(out["render"] ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            pytest.raises(ValueError, match="need_grads"):
        jax.grad(loss)(jnp.asarray(colors))


@pytest.mark.slow
def test_surfel_lean_mode_strict_on_snapped_depths():
    """The loose lean-vs-exact tolerances above exist ONLY to absorb
    19-bit depth-key sort-order flips between near-equal depths.  Snapping
    every center depth onto the quantized-key grid (zero low 13 mantissa
    bits) makes the packed and exact sorts order identically, so the
    TIGHT per-pixel tolerance must hold on ALL pixels — a sub-5% whole-
    image regression can no longer hide in the flip allowance."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    n = 80
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    xyz[:, 2] += 2.5
    # camera is R=I, T=(0,0,3): view depth = z + 3. Give every surfel a
    # UNIQUE depth on the 19-bit key grid (top 19 f32 bits = 10 mantissa
    # bits; quantum ~0.004 here), >= 2 quanta apart: the quantized-key
    # sort then orders identically to the exact f32 sort with NO ties
    # (equal snapped depths tie-break differently between the two stable
    # sorts — measured: pure gid swaps at equal depth)
    order = np.argsort(xyz[:, 2])
    uniq = (5.0 + np.arange(n, dtype=np.float32) * (2.0 / 256.0))
    uniq = np.frombuffer(
        (uniq.view(np.uint32) & np.uint32(0xFFFFE000)).tobytes(), np.float32)
    assert len(np.unique(uniq)) == n
    xyz[order, 2] = uniq - 3.0
    scales = np.abs(rng.normal(size=(n, 3)).astype(np.float32)) * 0.15 + 0.02
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    settings = _settings(_front_camera(64, 48))

    def run(need_grads):
        s = settings._replace(backend="pallas", num_entries=1 << 13,
                              chunk=512, need_grads=need_grads)
        return rasterize_surfel.rasterize_surfels(
            jnp.asarray(xyz), jnp.asarray(opac), s,
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=jnp.asarray(colors),
        )

    with pltpu.force_tpu_interpret_mode():
        exact = run(True)
        lean = run(False)
    for k, tol in (("render", 4e-3), ("rendered_alpha", 4e-3),
                   ("rendered_normal_view", 4e-3),
                   # depth compounds the mid-quantum Dk2 key reconstruction
                   # (half-quantum ~2e-3 at depth ~5) with the f16 slope
                   # pair across overlapping surfels
                   ("rendered_depth_sum", 3e-2)):
        d = np.abs(np.asarray(lean[k]) - np.asarray(exact[k]))
        assert d.max() < tol, f"{k}: max|err|={d.max():.5f} (strict)"


@pytest.mark.slow
def test_surfel_pallas_empty_and_saturated():
    """Edge cases for the Pallas surfel path: an empty scene (all culled)
    and a heavily saturated stack of opaque surfels."""
    from jax.experimental.pallas import tpu as pltpu

    settings = _settings(_front_camera(64, 48))._replace(
        backend="pallas", num_entries=1 << 13, chunk=512
    )

    # empty: all surfels behind the camera
    n = 16
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = -5.0
    scales = np.full((n, 3), 0.1, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    with pltpu.force_tpu_interpret_mode():
        out = rasterize_surfel.rasterize_surfels(
            jnp.asarray(xyz), jnp.full(n, 0.9), settings,
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=jnp.full((n, 3), 0.5),
        )
    assert float(jnp.max(out["rendered_alpha"])) == 0.0
    assert np.isfinite(np.asarray(out["render"])).all()

    # saturated: 200 overlapping opaque surfels in front of the camera —
    # transmittance must terminate, outputs stay finite, alpha ~ 1
    n = 200
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = np.linspace(1.0, 2.0, n)
    scales = np.full((n, 3), 0.1, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    with pltpu.force_tpu_interpret_mode():
        out = rasterize_surfel.rasterize_surfels(
            jnp.asarray(xyz), jnp.full(n, 0.95), settings,
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=jnp.full((n, 3), 0.5),
        )
    img = np.asarray(out["render"])
    alpha = np.asarray(out["rendered_alpha"])
    assert np.isfinite(img).all() and np.isfinite(alpha).all()
    cy, cx = 24, 32
    assert alpha[0, cy, cx] > 0.99


def test_surfel_pallas_gradients_match_xla():
    """jax.grad through the Pallas surfel path (custom_vjp backward) must
    match the XLA compositor's autodiff gradients."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    n = 60
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
    xyz[:, 2] += 2.4
    scales = np.abs(rng.normal(size=(n, 2)).astype(np.float32)) * 0.12 + 0.03
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    settings = _settings(_front_camera(64, 48))
    wr = jnp.asarray(rng.normal(size=(3, 48, 64)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(1, 48, 64)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(1, 48, 64)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(3, 48, 64)).astype(np.float32))
    wm = jnp.asarray(rng.normal(size=(1, 48, 64)).astype(np.float32))

    def loss(backend, xyz, opac, scales, quats, colors, off):
        s = settings._replace(backend=backend, num_entries=1 << 13, chunk=512)
        out = rasterize_surfel.rasterize_surfels(
            xyz, opac, s, scales=scales, rotations=quats,
            colors_precomp=colors, means2D_offset=off,
        )
        return (jnp.sum(out["render"] * wr)
                + jnp.sum(out["rendered_depth_sum"] * wd)
                + jnp.sum(out["rendered_alpha"] * wa)
                + jnp.sum(out["rendered_normal_view"] * wn)
                + jnp.sum(out["rendered_dist_m2"] * wm)
                + 0.5 * jnp.sum(out["rendered_dist_m1"] * wd))

    args = (jnp.asarray(xyz), jnp.asarray(opac), jnp.asarray(scales),
            jnp.asarray(quats), jnp.asarray(colors),
            jnp.zeros((n, 2), jnp.float32))
    g_ref = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4, 5))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(lambda *a: loss("pallas", *a),
                         argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["xyz", "opac", "scales", "quats", "colors", "offset"]
    for nm, a, b in zip(names, g_pal, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        assert np.isfinite(a).all(), nm
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=nm)
